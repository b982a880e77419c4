package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.PlanMetrics
import graft.sources.{DedupIndex, HashBloom, Tables}

/** Round-14 A/B: the Bloom pre-gate's EXACT-gate economics, measured in
  * the regime the sidecar was designed for — a small daily batch probing
  * a corpus index that dwarfs it (the inverse of the catalog rows, whose
  * boundary-400 fixture makes the corpus trivially broadcastable and the
  * gate pure overhead at every SF, VERDICT r12/r13 perf-weak finding).
  *
  * Three forms of the SAME exact gate (near-dup gate excluded — it is
  * identical across forms and would wash out the comparison), each
  * proven output-identical by checksum before timing is believed:
  *
  *  A `plain`   — anti-join vs the bucketed corpus hash table
  *                ([[DedupIndex.corpusHashes]]): the probe always reads
  *                the FULL corpus side, whatever the batch size.
  *  B `bloom`   — [[DedupIndex.dedupBatchBloom]]'s two-branch exact gate:
  *                the filter trims the BATCH side only; the corpus read
  *                is untouched, so this can only add overhead here.
  *  C `pruned`  — [[DedupIndex.exactNewPruned]]: the filter's surviving
  *                maybe rows name the only hive partitions of the pruned
  *                layout ([[DedupIndex.corpusHashesPruned]]) the probe
  *                opens — Bloom-directed partition pruning, the regime
  *                where the sidecar finally pays for its build.
  *
  * Batch = the top `SPARK_GRAFT_AB_BATCH` (default 2000) doc_ids;
  * corpus = everything below them. Records per-form best-of-2 seconds,
  * shuffle/spill bytes, and scan files/bytes (the pruning evidence) as
  * one JSON file. Run it against the sf1000 documents fixture in tmux:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BloomAB /tmp/graft_sf1000 bloom_ab_sf1000.json"
  */
object BloomAB {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "bloom_ab.json"
    val batchN = sys.env.getOrElse("SPARK_GRAFT_AB_BATCH", "2000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
    // boundary: the batchN-th doc_id from the top — one bounded driver
    // action to define the split (this is a measurement harness)
    val boundary = docs.select($"doc_id").orderBy($"doc_id".desc)
      .limit(batchN).agg(min($"doc_id")).as[Long].head()
    val nDocs = docs.count()
    System.err.println(s"[ab] corpus boundary=$boundary batch=$batchN of $nDocs docs")

    // artifacts (BuildOnce-stamped: first run builds, reps reuse)
    val t0 = System.nanoTime()
    val corpusHashes = DedupIndex.corpusHashes(spark, sfDir, boundary)
    val tHashes = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val bloom = DedupIndex.corpusBloom(spark, sfDir, boundary)
    bloom.cache().count() // the sidecar is the thing a prober holds hot
    val tBloom = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val pruned = DedupIndex.corpusHashesPruned(spark, sfDir, boundary)
    val tPruned = (System.nanoTime() - t2) / 1e9
    System.err.println(f"[ab] builds: hashes $tHashes%.1fs bloom $tBloom%.1fs pruned $tPruned%.1fs")

    def batch: DataFrame = docs.filter($"doc_id" >= boundary)
      .select($"doc_id", $"source", $"text")
    def hashed: DataFrame = batch.withColumn("_h", sha2($"text", 256))

    def formA(): DataFrame = {
      val h = hashed // bind: each `hashed` call mints fresh attribute ids
      h.join(corpusHashes, h("_h") === corpusHashes("h"), "left_anti")
    }
    def formB(): DataFrame = {
      val probed = HashBloom.withMaybe(hashed, bloom, "_h", DedupIndex.BloomBuckets)
      probed.filter(!$"_maybe").unionByName(
        probed.filter($"_maybe")
          .join(corpusHashes, probed("_h") === corpusHashes("h"), "left_anti"))
    }
    def formC(): DataFrame =
      DedupIndex.exactNewPruned(hashed, pruned, bloom,
        bloomBuckets = DedupIndex.BloomBuckets)

    // output-identity proof: count + order-insensitive checksum of kept ids
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64($"doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val cks = Seq("plain" -> formA(), "bloom" -> formB(), "pruned" -> formC())
      .map { case (n, df) => n -> checksum(df.select("doc_id")) }
    require(cks.map(_._2).distinct.size == 1,
      s"exact-gate forms disagree: $cks — timing a wrong plan is meaningless")
    System.err.println(s"[ab] outputs identical: ${cks.head._2}")

    case class Run(sec: Double, shuffleMb: Double, spillMb: Double,
        scanFiles: Long, scanMb: Double)
    def time(mk: () => DataFrame): Run = {
      val reps = (1 to 2).map { _ =>
        val df = mk()
        val s0 = System.nanoTime()
        val (bytes, scans) = PlanMetrics.measureWithScans(df)
        val sec = (System.nanoTime() - s0) / 1e9
        Run(sec, bytes.shuffleWrite / 1048576.0, bytes.spill / 1048576.0,
          scans.files, scans.bytes / 1048576.0)
      }
      reps.minBy(_.sec)
    }

    val runs = Seq("plain" -> time(() => formA()), "bloom" -> time(() => formB()),
      "pruned" -> time(() => formC()))
    val prunedTotalFiles = pruned.inputFiles.length
    val json = runs.map { case (n, r) =>
      f""""$n":{"sec":${r.sec}%.3f,"shuffle_mb":${r.shuffleMb}%.1f,"spill_mb":${r.spillMb}%.1f,"scan_files":${r.scanFiles},"scan_mb":${r.scanMb}%.1f}"""
    }.mkString(
      s"""{"sf":"$sfDir","batch":$batchN,"corpus_docs":${nDocs - batchN},"kept":${cks.head._2._1},""" +
        s""""pruned_layout_files":$prunedTotalFiles,"parts":${DedupIndex.PrunedParts},""" +
        s""""build_sec":{"hashes":${f"$tHashes%.1f"},"bloom":${f"$tBloom%.1f"},"pruned":${f"$tPruned%.1f"}},""",
      ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
