package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Loud fixture-drift guards, run ONCE per verify/test session — moved
  * out of the query builders (VERDICT r07 finding 4: an eager min/max
  * inside a builder executes a full corpus pass on every invocation,
  * including every bench rep and plan inspection). One bounded
  * aggregation covers every assumption the fixture-calibrated queries
  * bake in; a regenerated fixture that breaks one fails HERE with a
  * message, instead of letting the affected oracle rows pass vacuously.
  */
object FixtureGuards {

  /** Checks (one scan of `documents`, driver receives one row):
    *  - `domain_mix` linear rate formula: every source's rate_pct in
    *    (0, 100], and — ADVICE r07 — NO null rates (a source without
    *    trailing digits nulls the regexp extract, and min/max alone
    *    would skip it while the query silently dropped its docs);
    *  - `incremental_dedup` corpus/batch boundary: doc_ids must span
    *    [[LlmOps.CorpusBoundaryId]] on both sides, or the row passes
    *    vacuously with an empty batch or empty corpus.
    */
  def check(s: SparkSession, d: String): Unit = {
    checkDocs(Tables.documents(s, d))
    checkEmbeddings(Tables.embeddings(s, d))
  }

  /** The ANN family's fixture assumptions, one bounded aggregation:
    * query vectors are `vec_id < 10`, IVF centroid seeds `vec_id < 8`,
    * the semantic-decontam benchmark is the fixed set `vec_id % 50 = 0
    * AND vec_id < `[[LlmOps.SemanticBenchMaxId]] — all of which
    * silently produce empty query/benchmark sets (vacuously green
    * recall and decontam rows) if a regenerated fixture started ids at
    * 1000 or shrank below ~100 vectors. */
  def checkEmbeddings(embs: org.apache.spark.sql.DataFrame): Unit = {
    val r = embs.agg(
      min(col("vec_id")).cast("long"), max(col("vec_id")).cast("long"),
      count(lit(1)),
      count(when(exists(col("embedding"),
        x => isnan(x) || abs(x) > Float.MaxValue), 1))).head()
    require(!r.isNullAt(0) && r.getLong(0) == 0L && r.getLong(2) >= 100L,
      s"embeddings fixture drifted: ANN queries assume vec_id 0..9 exist " +
        s"(got min=${r.get(0)}) and ≥100 vectors for the benchmark/recall " +
        s"sets (got ${r.get(2)})")
    // the int8-quantization oracle contract assumes FINITE components:
    // Spark-side quantizeInt8 zeros a poisoned vector (robustness), the
    // SQL twin propagates NaN — a non-finite fixture would hash-mismatch
    // the quant rows confusingly instead of failing here with a name
    require(r.getLong(3) == 0L,
      s"embeddings fixture drifted: ${r.getLong(3)} vectors carry " +
        "NaN/Inf components — the quant_* oracle twins assume finite input")
  }

  /** Frame-level form (spec-injectable with synthetic drifted corpora). */
  def checkDocs(docs: org.apache.spark.sql.DataFrame): Unit = {
    val r = docs.agg(
      min(Curation.mixRatePct), max(Curation.mixRatePct),
      count(when(Curation.mixRatePct.isNull, 1)),
      min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long")).head()
    require(!r.isNullAt(0) && r.getInt(0) > 0 && r.getInt(1) <= 100,
      s"domain_mix: rate_pct out of (0,100] for some source " +
        s"(min=${r.get(0)}, max=${r.get(1)}) — fixture drifted")
    require(r.getLong(2) == 0L,
      s"domain_mix: ${r.getLong(2)} docs have a null rate_pct (source " +
        "without trailing digits) — they would be silently dropped with " +
        "null weights; fixture drifted")
    require(r.getLong(3) < LlmOps.CorpusBoundaryId &&
      r.getLong(4) >= LlmOps.CorpusBoundaryId,
      s"incremental_dedup: documents must span the corpus/batch boundary " +
        s"${LlmOps.CorpusBoundaryId} (got ids ${r.get(3)}..${r.get(4)})")
  }
}
