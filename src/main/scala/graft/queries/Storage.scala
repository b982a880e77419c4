package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.sinks.{JdbcSink, Writers}
import graft.operators.Evolve

/** Sink-side semantics as runnable queries (SURVEY §2.2 K2-K4, §2.7 L6):
  * hive-partitioned write + pruned read-back, schema-evolving union, batch
  * slicing. */
object Storage {

  /** K2 + partition pruning: write `orders` hive-partitioned by
    * year/month (derived from the order date), read back with a partition
    * filter, aggregate. The filter must prune at the FILE level — the scan
    * reads only the `year=1997` directories; `.explain` shows the pruned
    * partition count. The oracle computes the same thing straight from the
    * unpartitioned table. */
  val partitionPrune = Q("partition_prune", (s, d) => {
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part_" +
      d.replaceAll("[^A-Za-z0-9]", "_")
    // repartition by the partition columns before the partitioned write
    // (guide §6 / §2.4): without it every input task opens a writer for
    // every (year,month) it touches — T×84 small files, and at sf0.1 the
    // single-task input serializes all 84 file writes through one core.
    // Hash-clustered on the partition key the write runs one task per
    // populated shuffle partition, each emitting whole directories (one
    // file per partition at any scale — the layout a 100 TB reader
    // wants). Values are unchanged; only file layout/parallelism move.
    Tables.orders(s, d)
      .withColumn("year", date_format($"o_orderdate", "yyyy"))
      .withColumn("month", date_format($"o_orderdate", "MM"))
      .repartition($"year", $"month")
      .write.mode("overwrite").partitionBy("year", "month").parquet(path)
    // partition-value type inference reads year/month back as ints —
    // normalize month to the zero-padded hive string for the oracle
    s.read.parquet(path)
      .filter($"year" === 1997)
      .groupBy(lpad($"month".cast("string"), 2, "0").as("month"))
      .agg(count(lit(1)).as("n"), sumd($"o_totalprice").as("revenue"))
  }, Some(s"""
    SELECT strftime(o_orderdate, '%m') AS month, COUNT(*) AS n,
           ${sumdSql("o_totalprice")} AS revenue
    FROM orders WHERE strftime(o_orderdate, '%Y') = '1997'
    GROUP BY 1 ORDER BY month"""),
    sortCols = Seq("month"))

  /** Fixed opt-out list for [[targetedDelete]] — ids present at every
    * test SF (documents has ≥500 rows at sf0.001). */
  private val TargetedDropIds: Seq[Long] = Seq(7L, 42L, 99L, 256L, 400L)

  /** Targeted delete as a query row (K5's corpus-scale form,
    * [[Writers.deleteWhere]]): land `documents` range-clustered on
    * doc_id, delete a bounded opt-out id list — rewriting only the
    * files whose min/max footers admit a dropped id — and aggregate the
    * surviving corpus. The row intentionally pays the full
    * cluster-write + delete + read-back (the `partition_prune`
    * convention: sink rows measure the sink); WritersSpec asserts the
    * file-level claims (untouched files byte-identical, rewrite bounded
    * to the hit files). The oracle computes the post-delete aggregate
    * straight off the source table — if the swap lost or duplicated ONE
    * row anywhere, the hash mismatches. */
  val targetedDelete = Q("targeted_delete", (s, d) => {
    import s.implicits._
    // pid-scoped path: a concurrent verifier JVM must not race this
    // JVM's cluster-write/delete/read-back cycle on a shared directory
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_del_" +
      s"${ProcessHandle.current().pid()}_" + d.replaceAll("[^A-Za-z0-9]", "_")
    Writers.clusteredByRange(Tables.documents(s, d), "doc_id", path, 16)
    Writers.deleteWhere(s, path, "doc_id", TargetedDropIds)
    s.read.parquet(path)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }, Some(s"""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id NOT IN (${TargetedDropIds.mkString(", ")})
    GROUP BY source ORDER BY source"""),
    sortCols = Seq("source"))

  /** K4 as a query: two differently-shaped batches (narrow INT-keyed vs
    * wide BIGINT-keyed) unioned through [[Evolve.unionEvolve]] — key
    * widens INT→BIGINT, the new column null-pads the old batch. */
  val evolveUnion = Q("evolve_union", (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d)
    val b1 = c.filter($"c_custkey" % 2 === 0)
      .select($"c_custkey".cast("int").as("id"), $"c_name".as("name"))
    val b2 = c.filter($"c_custkey" % 2 === 1)
      .select($"c_custkey".as("id"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
    Evolve.unionEvolve(Seq(b1, b2))
  }, Some("""
    SELECT c_custkey AS id, c_name AS name,
           CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END AS acctbal
    FROM customer ORDER BY id"""),
    sortCols = Seq("id"))

  /** L6 batch slicing (`all_data[i:i+batch_size]`,
    * `lambda_function.py:336-340`): key-range batching — the scale-safe
    * equivalent of positional slicing (no global row_number; the batch id
    * is a pure projection, so batching distributes). */
  val batchSlice = Q("batch_slice", (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey", expr("c_custkey div 200").as("batch_id"))
      .groupBy($"batch_id")
      .agg(count(lit(1)).as("n"),
        min($"c_custkey").as("from_key"), max($"c_custkey").as("to_key"))
  }, Some("""
    SELECT c_custkey // 200 AS batch_id, COUNT(*) AS n,
           min(c_custkey) AS from_key, max(c_custkey) AS to_key
    FROM customer GROUP BY 1 ORDER BY batch_id"""),
    sortCols = Seq("batch_id"))

  /** S12 + K6 as a query: two schema-evolving batches land in a LIVE JDBC
    * table (embedded Derby — the in-process stand-in for the reference's
    * RDS endpoint, `Utils/sql.py:24-43`): batch 1 via the Spark JDBC
    * append after a driver-side CREATE, batch 2 via the transactional
    * per-partition load after a driver-side ALTER. Reading the table back
    * proves create → evolve → align → insert end-to-end; rows that predate
    * the `total_price` column are null-padded. */
  val jdbcRoundtrip = Q("jdbc_roundtrip", (s, d) => {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val o = Tables.orders(s, d)
    val b1 = o.filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", $"o_orderstatus")
    val b2 = o.filter($"o_orderkey" % 10 === 1)
      .select($"o_orderkey", $"o_orderstatus", dec2($"o_totalprice").as("total_price"))
    JdbcSink.appendEvolve(b1, url, "orders_jdbc")
    JdbcSink.transactionalLoad(b2, url, "orders_jdbc")
    s.read.format("jdbc").option("url", url).option("dbtable", "orders_jdbc").load()
      .select($"o_orderkey", $"o_orderstatus",
        $"total_price".cast("double").as("total_price"))
  }, Some("""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 10 = 1
                THEN CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE) END AS total_price
    FROM orders WHERE o_orderkey % 10 < 2 ORDER BY o_orderkey"""),
    sortCols = Seq("o_orderkey"), headline = false)

  /** Keyed MERGE over a landed dataset as a query row
    * ([[Writers.upsertByKey]] — the file-level sibling of the JDBC
    * `ON DUPLICATE KEY UPDATE` load, `Utils/sql.py:79-99`): land
    * `customer` range-clustered on the key, apply one deterministic
    * update batch (every 97th key relabeled into a sentinel segment;
    * every 193rd key cloned under a fresh NEGATIVE key — absent at
    * every SF and in every ScaleUp-derived fixture, whose shifts are
    * strictly positive), and aggregate the merged dataset by segment.
    * The row pays cluster-write + merge + read-back by the
    * `partition_prune` convention (sink rows measure the sink);
    * WritersSpec asserts the file-level claims (untouched files
    * byte-identical, rewrite bounded to hit files, crash-window
    * no-loss). The oracle rebuilds the merge relationally from the
    * source table — one lost, duplicated, or stale row anywhere and
    * the hash mismatches. */
  val upsertMerge = Q("upsert_merge", (s, d) => {
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ups_" +
      s"${ProcessHandle.current().pid()}_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val c = Tables.customer(s, d)
    Writers.clusteredByRange(c, "c_custkey", path, 16)
    // the update is a pure relabel — no FP arithmetic, so the oracle's
    // rebuilt rows are bit-identical by construction
    val updates = c.filter($"c_custkey" % 97 === 0)
      .withColumn("c_mktsegment", lit("UPSERTED"))
      .unionByName(c.filter($"c_custkey" % 193 === 0)
        .withColumn("c_custkey", -$"c_custkey" - 1))
    Writers.upsertByKey(s, path, "c_custkey", updates)
    s.read.parquet(path)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sumd($"c_acctbal").as("bal"),
        sum($"c_custkey").as("key_sum"))
  }, Some(s"""
    WITH upd AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             'UPSERTED' AS c_mktsegment
      FROM customer WHERE c_custkey % 97 = 0),
    ins AS (
      SELECT -c_custkey - 1 AS c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 193 = 0),
    merged AS (
      SELECT * FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins)
    SELECT c_mktsegment, COUNT(*) AS n, ${sumdSql("c_acctbal")} AS bal,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM merged GROUP BY 1 ORDER BY c_mktsegment"""),
    sortCols = Seq("c_mktsegment"))

  /** Small-file compaction as a query row ([[Writers.compactSmallFiles]]
    * — the standing maintenance op incremental sinks need: the
    * reference lands 200-row objects, `S3.py:137-156`, and a year of
    * that at corpus scale is a listing+footer storm): land `documents`
    * fragmented across 32 files, compact everything under the size
    * floor into ~target-sized outputs, and aggregate the read-back.
    * The oracle computes the same aggregate straight off the source
    * table — compaction must be a pure layout move, so one row lost,
    * duplicated, or mangled in the merge flips the hash. File-count
    * and untouched-big-file claims live in WritersSpec. */
  val compactRoundtrip = Q("compact_roundtrip", (s, d) => {
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_cmp_" +
      s"${ProcessHandle.current().pid()}_" + d.replaceAll("[^A-Za-z0-9]", "_")
    Tables.documents(s, d).repartition(32)
      .write.mode("overwrite").parquet(path)
    Writers.compactSmallFiles(s, path,
      targetBytes = 64L << 20, minBytes = 32L << 20)
    s.read.parquet(path)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }, Some("""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1, 2 ORDER BY source, lang"""),
    sortCols = Seq("source", "lang"))

  val all: Seq[Q] = Seq(partitionPrune, evolveUnion, batchSlice, jdbcRoundtrip,
    targetedDelete, upsertMerge, compactRoundtrip)
}
