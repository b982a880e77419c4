package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{ArtifactStore, DedupIndex, HashBloom}

/** The one-command maintenance walker over a populated artifact tree:
  * an evolving user-owned index (duplicated absorbs + a live sidecar)
  * and a plain build-once artifact base, maintained in one call each. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  test("index root: compact + bloom rebuild + vacuum, probes stay correct") {
    val dir = Files.createTempDirectory("graft_maint").toString + "/idx"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the maintenance fixture"),
      (2L, "a second corpus document with entirely unrelated maintenance content")
    ).toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    // absorb the same rows twice: duplicate hash rows + a growing sidecar
    DedupIndex.absorbBloom(spark, idx, corpus)
    DedupIndex.absorb(spark, idx, corpus)
    val batch = Seq((10L, "a wholly new document the maintenance run must keep probing out"))
      .toDF("doc_id", "text")
    DedupIndex.absorbBloom(spark, idx, batch)
    DedupIndex.absorb(spark, idx, batch)
    val f = ArtifactStore.fs(dir)
    val dupN = spark.table(DedupIndex.open(spark, dir).hashes).count()
    assert(dupN > 3, "fixture lost its point: absorbs should duplicate hash rows")

    val r = Maintain.maintainRoot(spark, dir, keep = 1, staleMs = 0L)
    assert(r.kind == "index" && r.compacted && r.bloomRebuilt)
    assert(r.versionsAfter == 1, s"vacuum should keep 1 version, kept ${r.versionsAfter}")
    assert(ArtifactStore.versions(f, s"$dir/_bloom").length == 1)
    assert(!ArtifactStore.activeClaim(f, dir) &&
      !ArtifactStore.activeClaim(f, s"$dir/_bloom"))

    // the compacted table is re-distincted and still gates everything
    val maintained = DedupIndex.open(spark, dir)
    assert(spark.table(maintained.hashes).count() == 3) // 2 corpus + 1 batch
    assert(DedupIndex.dedupBatch(spark, maintained, corpus).isEmpty)
    assert(DedupIndex.dedupBatch(spark, maintained, batch).isEmpty)

    // the rebuilt sidecar equals the hash table: no false negatives, and
    // geometry metadata agrees with the files
    val bloom = DedupIndex.ensureBloom(spark, maintained)
    val (b, w) = DedupIndex.sidecarGeometry(spark, maintained)
    assert(b == HashBloom.bucketsOf(bloom) && w == HashBloom.widthOf(bloom))
    val fn = HashBloom.withMaybe(spark.table(maintained.hashes), bloom, "h", b)
      .filter(!col("_maybe")).count()
    assert(fn == 0L, s"$fn false negatives after rebuild")
  }

  test("plain artifact root: vacuum only; mixed walk reports both kinds") {
    val base = Files.createTempDirectory("graft_maint_art").toString + "/artifact"
    val f = ArtifactStore.fs(base)
    def put(dir: String, body: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(dir, "data"), true)
      out.write(body.getBytes("UTF-8")); out.close()
    }
    ArtifactStore.commit(f, base)(d => put(d, "one"))
    val v2 = ArtifactStore.commit(f, base)(d => put(d, "two"))
    val r = Maintain.maintainRoot(spark, base, keep = 1, staleMs = 0L)
    assert(r.kind == "artifact" && !r.compacted && !r.bloomRebuilt)
    assert(r.versionsBefore == 2 && r.versionsAfter == 1)
    assert(ArtifactStore.currentDir(f, base).contains(v2))
  }

  test("flat dataset root: small files compacted, content preserved") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_maint_ds").toString + "/sink"
    spark.range(200).select(col("id").as("doc_id"))
      .repartition(20).write.parquet(dir)
    val nBefore = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nBefore == 20)
    val r = Maintain.maintainRoot(spark, dir, keep = 1, staleMs = 0L,
      compactTargetBytes = 1L << 30, compactMinBytes = 1L << 30)
    assert(r.kind == "dataset" && r.compacted, s"unexpected report $r")
    assert(r.filesBefore == 20 && r.filesAfter < 20)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200 &&
      back.select("doc_id").distinct().count() == 200)
    // a second pass over the already-compacted root is a no-op report
    val r2 = Maintain.maintainRoot(spark, dir, keep = 1, staleMs = 0L,
      compactTargetBytes = 1L << 30, compactMinBytes = 1L << 30)
    assert(r2.kind == "dataset")
    assert(r2.filesAfter == r.filesAfter)
  }
}
