package graft

import graft.driver.TrainingPrep

/** The composed training-data prep chain: each stage's effect is
  * observable on a crafted corpus (short junk, exact dups, near dups,
  * clean survivors). */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over a lazy dog and then " +
    "runs far away into the deep green forest to hide from the hunters"

  test("prepare: quality gate, exact dedup, near-dup removal, stamps — in one chain") {
    val docs = Seq(
      (1L, base),                             // keeper (canonical of 1,2,3)
      (2L, base),                             // exact dup of 1 → dropped
      (3L, base.replace("green", "teal")),    // near dup of 1 → dropped
      (4L, "too short"),                      // quality-gated (< 5 words)
      (5L, "completely different content about spark engines and their " +
        "catalyst optimizer running distributed relational queries at scale"))
      .toDF("doc_id", "text")
    val out = TrainingPrep.prepare(docs).orderBy($"doc_id")
    val ids = out.select($"doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 5L), s"survivors were $ids")
    val r1 = out.filter($"doc_id" === 1).head()
    assert(r1.getAs[Int]("n_tokens") == base.split(" ").length)
    assert(r1.getAs[String]("lang_pred") == "en")
    assert(!out.columns.contains("content_hash"))
    // deterministic: same input → same fingerprints, any partitioning
    val out7 = TrainingPrep.prepare(docs.repartition(7)).orderBy($"doc_id")
    assert(out.collect().toSeq == out7.collect().toSeq)
  }

  test("prepare: exact dedup keeps the MINIMUM id as canonical") {
    val docs = Seq((9L, base), (4L, base), (7L, base)).toDF("doc_id", "text")
    val ids = TrainingPrep.prepare(docs).select($"doc_id").as[Long].collect().toSeq
    assert(ids == Seq(4L))
  }
}
