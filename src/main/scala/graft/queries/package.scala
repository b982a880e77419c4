package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Query-catalog plumbing shared by the oracle-checked queries.
  *
  * Oracle parity rules (driver compares Spark parquet vs DuckDB by value
  * hash, SURVEY §5):
  *  - every aggregate over floating-point inputs is computed in *exact*
  *    decimal (or scaled-integer) arithmetic, rounded to a fixed small
  *    scale, and only then cast to double — so Spark and DuckDB produce
  *    bit-identical doubles regardless of partitioning / summation order;
  *  - every query's VERIFY view ends in a total ORDER BY over its output
  *    columns. Large-output queries keep that sort OUT of the scale plan
  *    ([[Q.run]]) and declare it as [[Q.sortCols]] instead — [[Q.verifyRun]]
  *    appends it only for the oracle dump, while Bench times the raw plan
  *    (a global sort of a 100 TB result exists only for hashing, never in
  *    the plan a user would run);
  *  - every computed column is aliased identically in Spark and SQL.
  */
package object queries {

  /** One catalog entry: Spark implementation + optional DuckDB oracle SQL.
    *
    * @param run      the scale plan — what Bench times; NO oracle-only sort
    * @param oracle   DuckDB SQL twin (with ORDER BY matching sortCols)
    * @param sortCols total-order columns appended only in [[verifyRun]] for
    *                 deterministic oracle hashing (ascending)
    * @param headline Bench times headline queries only; non-headline entries
    *                 are correctness demos whose plan is intentionally
    *                 redundant (e.g. split∘rejoin identity)
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      sortCols: Seq[String] = Nil,
      headline: Boolean = true) {

    /** Deterministic view for the driver's correctness dump. */
    def verifyRun: (SparkSession, String) => DataFrame =
      if (sortCols.isEmpty) run
      else (s, d) => run(s, d).orderBy(sortCols.map(col): _*)
  }

  /** Exact decimal view of a double column (2-decimal money semantics —
    * the reference's DECIMAL(10,2) sink mapping, `Utils/sql.py:53-54`). */
  def dec2(c: Column): Column = c.cast(DecimalType(20, 2))

  /** Order-insensitive exact sum: decimal-sum, round(2), cast double.
    * Bit-identical across engines for |scaled value| < 2^53. */
  def sumd(c: Column): Column = round(sum(dec2(c)), 2).cast("double")

  /** SQL twin of [[sumd]]. */
  def sumdSql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(20,2))), 2) AS DOUBLE)"

  /** Portable 60-bit string hash: first 15 hex digits of md5, as a
    * non-negative long. Bit-identical in DuckDB via
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` — the deterministic
    * cross-engine primitive under MinHash/SimHash/fingerprints. Unlike
    * `hash()`/`xxhash64` it is engine-independent; md5 is codegen'd
    * (no UDF) and cost is amortized per token, not per row. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** SQL twin of [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
}
