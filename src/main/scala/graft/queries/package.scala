package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Query-catalog plumbing shared by the oracle-checked queries.
  *
  * Oracle parity rules (driver compares Spark parquet vs DuckDB by value
  * hash, SURVEY §5):
  *  - every aggregate over floating-point inputs is computed in *exact*
  *    decimal arithmetic, rounded to a fixed small scale, and only then cast
  *    to double — so Spark and DuckDB produce bit-identical doubles
  *    regardless of partitioning / summation order;
  *  - every query ends in a total ORDER BY over its output columns;
  *  - every computed column is aliased identically in Spark and SQL.
  */
package object queries {

  /** One catalog entry: Spark implementation + optional DuckDB oracle SQL. */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      /** headline queries are the ones Bench times */
      headline: Boolean = true)

  /** Exact decimal view of a double column (2-decimal money semantics —
    * the reference's DECIMAL(10,2) sink mapping, `Utils/sql.py:53-54`). */
  def dec2(c: Column): Column = c.cast(DecimalType(20, 2))

  /** Order-insensitive exact sum: decimal-sum, round(2), cast double.
    * Bit-identical across engines for |scaled value| < 2^53. */
  def sumd(c: Column): Column = round(sum(dec2(c)), 2).cast("double")

  /** SQL twin of [[sumd]]. */
  def sumdSql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(20,2))), 2) AS DOUBLE)"
}
