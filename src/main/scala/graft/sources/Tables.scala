package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    * Verify / Bench / tests). Earlier driver fixtures shipped `events.ts`
    * as parquet TIMESTAMP(NANOS), which the vectorized reader rejects —
    * `nanosAsLong` reads it as raw long nanos instead (harmless no-op on
    * the current timestamp[us] fixtures; kept so both generations load).
    * Set here once, NOT as a reader side-effect (a reader mutating shared
    * session conf would silently change how sibling queries parse nanos). */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // native Catalyst functions (scaled_dot) — see graft.GraftExtensions
    "spark.sql.extensions" -> "graft.GraftExtensions",
    // let AQE convert a sort-merge join to a shuffled-hash join when the
    // measured per-partition build side fits a local map (64 MB). Off by
    // default in Spark (threshold 0); without it, a join whose small
    // side outgrows the BROADCAST threshold degrades all the way to SMJ
    // and external-sorts the BIG side — the round-15 sf1000 diagnosis
    // found the two verified-pairs verify joins sorting the 8 GB
    // signature frame (~14 GB of the 70 GB spill) for a pair side of
    // 13 MB/partition. Bounded by construction: AQE converts only when
    // the build side's runtime size fits the threshold.
    // ROUND-17 CORRECTION: the key is `maxShuffledHashJoinLocalMapThreshold`
    // — rounds 15-16 set a key Spark does not have (`shuffledHashJoin
    // LocalMapThreshold`, silently ignored), so every conversion
    // attributed to this conf actually came from the explicit
    // .hint("shuffle_hash") calls; the auto-conversion fires for the
    // first time this round (A/B in PERF.md round-17 §7). NOTE Spark
    // converts only when this is ≥ spark.sql.adaptive
    // .advisoryPartitionSizeInBytes (default 64 MB) AND every runtime
    // partition of the build side fits it — 64 MB here is the minimum
    // useful value, and the conversion stays bounded by construction.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864",
    // ObjectHashAggregate (collect_set/collect_list buckets) falls back
    // to SORT-BASED aggregation once its in-memory map holds this many
    // DISTINCT KEYS (default 128 — sized for giant per-group buffers,
    // not for millions of tiny ones). The pair family's bucket
    // aggregates group a census-pruned stream into MILLIONS of ≤64-row
    // buckets, so the default re-sorted the whole pruned stream per
    // execution: 3.2 GB of the 12.3 GB minhash_pairs_verified spill at
    // 50 M docs was exactly this fallback sort
    // (r18m/attr_mpv_sf1000.txt: ObjectHashAggregate partial_collect_set
    // spillSize=3209MB on an input that was ALREADY partitioned and
    // sorted by bucket). 2^20 keys keeps those aggregates hash-based:
    // per-partition state is keys × (tiny bucket buffer) — a few tens
    // of MB at the fourth decade's densities — and a genuinely huge
    // SINGLE group is bounded by the bucket-size guards
    // (Vectors.withBucketBound / the LSH geometry), not by this knob.
    // Key verified against the Spark 4.1.2 jars (the r17 fake-key
    // lesson: unknown spark.sql.* keys no-op silently).
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1048576",
    // Partition discovery launches a DISTRIBUTED listing job once a read
    // sees more than this many paths (default 32). Every read of a
    // hive-partitioned artifact here (the pruned dedup index's ~199
    // partition dirs, partition_prune's 84 year/month dirs) paid a
    // ~200-task listing job PER EXECUTION — 0.4 s of scheduler overhead
    // at sf0.1 (r20 JobProfile: job "Listing leaf files" 199 tasks) for
    // directories a driver thread stats in milliseconds. 1024 keeps
    // driver-side listing for catalog-scale partition counts and still
    // hands genuinely huge layouts (10k+ partitions at 100 TB) to the
    // distributed path. Key verified against the Spark 4.1.2 jars.
    "spark.sql.sources.parallelPartitionDiscovery.threshold" -> "1024")

  // Schema cache, one entry per (JVM, parquet path): every q.run
  // re-reads the table footers at DataFrame CONSTRUCTION time just to
  // re-infer a schema that cannot change under a fixed fixture — the
  // same per-JVM memo contract as AnnGeometry's row-count cache.
  // Metadata only (never rows/results); a catalog would serve exactly
  // this. The data read itself still lists and reads files per query.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]

  /** One driver table: `dir/name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Test seam: forget cached schemas (a spec that rewrites a fixture
    * path must not inherit a stale schema). */
  private[graft] def invalidateSchemas(): Unit = schemaCache.clear()

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize an events frame's `ts` to a micros-precision UTC-instant
    * TimestampType regardless of which fixture generation wrote it:
    *  - INT64 TIMESTAMP(NANOS) (pre-2026-08-13 driver fixtures), read as
    *    raw long under [[requiredConfs]]' `nanosAsLong` → `div 1000` to
    *    micros (DuckDB's own ns→µs truncation matches; `div` truncates
    *    toward zero, which equals floor division only for post-epoch
    *    data — all driver events are 2024+);
    *  - timestamp[us] without timezone (current fixtures), which Spark
    *    surfaces as TIMESTAMP_NTZ → cast to TimestampType, reading the
    *    stored wall-clock as UTC under the session's UTC timeZone —
    *    exactly how the DuckDB oracle reads the same file (naive
    *    TIMESTAMP);
    *  - an already-instant TimestampType passes through.
    * Works on streaming frames too (the dispatch reads only the schema). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))

  /** Streaming read of `dir/name.parquet` that works with BOTH fixture
    * layouts. The driver writes each table as a single FILE named
    * `name.parquet`; the file-stream source wants a directory basePath,
    * so stream the parent filtered down to that filename. Spark-written
    * fixtures ([[graft.ScaleUp]]) make `name.parquet` a DIRECTORY of
    * part files — stream it as the basePath directly; the filename glob
    * would match no part file and the query would silently stream ZERO
    * rows (it did, at sf1.0, until this helper: the stream rows "ran"
    * 10× faster on 10× data because they processed nothing). Schema
    * comes from a batch read of the same path (streams can't infer). */
  def streamTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = table(s, dir, name).schema // per-JVM schema cache above
    val p = new org.apache.hadoop.fs.Path(path)
    val isDir = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    if (isDir) s.readStream.schema(schema).parquet(path)
    else s.readStream.schema(schema)
      .option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
