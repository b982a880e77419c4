package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Curation, Extensions, Ingest, Joins, LlmOps, Media, Nested, Q, Relational, Storage, StreamingOps, Temporal}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full catalog (grows per SURVEY §2 / §7.2). */
  def catalog: Seq[Q] =
    Relational.all ++ Nested.all ++ LlmOps.all ++ Curation.all ++
      Temporal.all ++ Storage.all ++ Media.all ++ Ingest.all ++
      Extensions.all ++ Joins.all ++ StreamingOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join revenue rollup: fact ⨝ 3 dims (broadcast) → grouped agg —
    * exercises scan pruning, broadcast joins, partial aggregation. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. Queries surface
    * in their deterministic verify view (scale plan + oracle sort). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.verifyRun).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
