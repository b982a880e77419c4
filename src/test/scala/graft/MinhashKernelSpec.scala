package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** [[graft.functions.MinhashSig]] — the per-row signature kernel — is
  * pinned bit-identical to the exploded relational twin
  * ([[TextOps.minhashSignaturesExploded]]) that the DuckDB oracles were
  * originally verified against, for BOTH hash kinds, across the edge
  * shapes tokenization can produce. The whole minhash family
  * (bands/pairs/clusters/index) rides on this equality. */
class MinhashKernelSpec extends SparkSpec {
  import spark.implicits._

  // every shingle-count regime + the concat_ws edge cases:
  //  - ≥3 tokens (many shingles), exactly 3 (one), 2/1 (whole-doc),
  //  - empty text ("" tokenizes to [""]), multi-space (empty tokens),
  //  - unicode bytes, null text (exploded form hashes the "" shingle)
  private val edge = Seq(
    (1L, (0 until 40).map(i => s"w$i").mkString(" ")),
    (2L, "alpha beta gamma"),
    (3L, "alpha beta"),
    (4L, "single"),
    (5L, ""),
    (6L, "a  b   c"),
    (7L, "héllo wörld ünïcode ﬁne 漢字 emoji🎉 done"),
    (8L, null.asInstanceOf[String]),
    (9L, "dup dup dup dup dup"))

  private def collectSigs(df: DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("kernel == exploded twin on edge shapes (md5)") {
    val df = edge.toDF("doc_id", "text")
    val kernel = collectSigs(TextOps.minhashSignatures(df, "doc_id", "text"))
    val exploded = collectSigs(TextOps.minhashSignaturesExploded(df, "doc_id", "text"))
    assert(kernel.keySet == exploded.keySet)
    for ((id, sig) <- exploded) assert(kernel(id) == sig, s"doc $id")
  }

  test("kernel == exploded twin on edge shapes (xxhash64)") {
    val df = edge.toDF("doc_id", "text")
    val kernel = collectSigs(
      TextOps.minhashSignatures(df, "doc_id", "text", useXx = true))
    val exploded = collectSigs(
      TextOps.minhashSignaturesExploded(df, "doc_id", "text", xxhash64(_)))
    for ((id, sig) <- exploded) assert(kernel(id) == sig, s"doc $id")
  }

  test("kernel == exploded twin on a generated 300-doc corpus") {
    val rnd = new scala.util.Random(11L)
    val words = Vector("the", "of", "spark", "shuffle", "data", "model",
      "train", "corpus", "token", "near", "dup", "hash", "band", "sig")
    val docs = (1L to 300L).map { id =>
      val n = rnd.nextInt(120) // includes 0..2-token whole-doc docs
      (id, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(5)
    val kernel = collectSigs(TextOps.minhashSignatures(df, "doc_id", "text"))
    val exploded = collectSigs(TextOps.minhashSignaturesExploded(df, "doc_id", "text"))
    assert(kernel == exploded)
  }

  test("signature build is a narrow zero-exchange projection") {
    // a Range source (not a local Seq, which constant-folds to a
    // LocalTableScan) so the executed plan shape is the production one
    val df = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("alpha beta gamma delta")).as("text"))
    val plan = TextOps.minhashSignatures(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "kernel signature build shuffles")
    assert(!plan.contains("HashAggregate"), "kernel signature build aggregates")
    // and it stays inside whole-stage codegen — toString marks fused
    // operators with the `*(n)` prefix; a fallback Project would have none
    assert(plan.contains("*(1) Project"), s"not codegen-fused:\n$plan")
  }

  test("band table via kernel == band table via exploded signatures") {
    val df = edge.toDF("doc_id", "text")
    val viaKernel = TextOps.minhashBandTable(df, "doc_id", "text")
      .orderBy($"doc_id", $"band").collect().toSeq
    val viaExploded = TextOps.bandTableFromSignatures(
        TextOps.minhashSignaturesExploded(df, "doc_id", "text"), "doc_id")
      .orderBy($"doc_id", $"band").collect().toSeq
    assert(viaKernel == viaExploded)
  }

  test("gram_set kernel == exploded collect_set form on edge shapes + corpus") {
    // the pairJaccard gram stage's differential: the per-row kernel
    // must reproduce ngramHashRows → collect_set → sort_array exactly —
    // hash domain (pmod(hash60, P)), 3-shingle walk, whole-doc collapse,
    // within-doc dedup, ascending order — including the null-text row
    // (exploded form hashes the "" gram via its otherwise-branch; the
    // kernel path reaches the same "" through the coalesce in
    // pairJaccard, reproduced here)
    val rnd = new scala.util.Random(13L)
    val words = Vector("the", "of", "spark", "data", "dup", "hash")
    val corpus = (100L to 250L).map { id =>
      (id, Seq.fill(rnd.nextInt(60))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = (edge ++ corpus).toDF("doc_id", "text").repartition(5)
    val viaKernel = df.select(col("doc_id"),
        call_function("gram_set",
          coalesce(TextOps.tokens(col("text")), array(lit("")))).as("ghs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExploded = TextOps.ngramHashRows(df, "doc_id", "text", n = 3,
        hashFn = h => pmod(graft.queries.hash60(h), lit(TextOps.P)))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("gram_hash"))).as("ghs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel.keySet == viaExploded.keySet)
    for ((id, ghs) <- viaExploded) assert(viaKernel(id) == ghs, s"doc $id")
  }

  test("gram-array build is a narrow zero-exchange projection") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", lit("tok"), col("id").cast("string"),
        lit("alpha beta gamma delta")).as("text"))
    val plan = df.select(col("doc_id"),
        call_function("gram_set",
          coalesce(TextOps.tokens(col("text")), array(lit("")))).as("ghs"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "gram-array build shuffles")
    assert(!plan.contains("Aggregate"), "gram-array build aggregates")
    assert(plan.contains("*(1) Project"), s"not codegen-fused:\n$plan")
  }
}
