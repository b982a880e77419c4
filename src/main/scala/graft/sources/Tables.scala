package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's object-store scan surface (SURVEY §2.1 S1/S2:
  * `Utils/S3.py:244-268,313-342`) re-expressed as declarative parquet scans so
  * Catalyst gets predicate pushdown / column pruning / partition pruning for
  * free. At cluster scale the same call reads a multi-TB hive-partitioned
  * dataset; nothing here collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session confs every graft session must set at BUILD time (Smoke /
    * Verify / Bench / tests). `events.ts` is parquet TIMESTAMP(NANOS),
    * which the vectorized reader rejects — read it as long nanos instead.
    * Set here once, NOT as a reader side-effect (a reader mutating shared
    * session conf would silently change how sibling queries parse nanos). */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // native Catalyst functions (scaled_dot) — see graft.GraftExtensions
    "spark.sql.extensions" -> "graft.GraftExtensions")

  /** One driver table: `dir/name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Raw long-nanos `ts` surfaced as a micros-precision TimestampType
    * (DuckDB's own ns→µs truncation matches). `div` truncates toward zero,
    * which equals floor division only for post-epoch data — all driver
    * events are 2024+; pre-epoch nanos would need floordiv. Requires
    * [[requiredConfs]] set at session build. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
