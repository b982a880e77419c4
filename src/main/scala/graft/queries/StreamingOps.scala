package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables

/** Streaming↔batch equivalence under the driver's hard oracle gate
  * (SURVEY §2.10; the reference's S3-event-driven micro-batch loop,
  * `Lambda/lambda_function.py:27-41`).
  *
  * The St-family's other properties are spec-tested (watermarks, resume,
  * dedup need a driver of their own); THIS row puts the core claim —
  * a Structured Streaming drain of the same files computes the same answer
  * as the batch engine — under the same DuckDB hash-compare as every batch
  * operator.
  *
  * Scale: the streamed plan is identical to the batch tumbling-window agg
  * (partial agg map-side, one shuffle); `Trigger.AvailableNow` drains with
  * checkpointed file-granularity exactly-once, so the equivalence is the
  * real production claim, not a toy. */
object StreamingOps {

  private val sinkId = new AtomicInteger(0)

  /** Drain `events` through a REAL streaming query — file source →
    * 2-day tumbling windows × event_type → memory sink, complete mode,
    * `Trigger.AvailableNow` — then hand the drained sink back as the
    * result. Oracle = the same aggregation as batch SQL over the same
    * parquet. */
  val streamBatchEquiv = Q("stream_batch_equiv", (s, d) => {
    import s.implicits._
    val sink = s"stream_equiv_sink_${sinkId.incrementAndGet()}"
    val q = Tables.normalizeEventTs(Tables.streamTable(s, d, "events"))
      .groupBy(window($"ts", "2 days").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink).select(
      date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
      $"event_type", $"n")
  }, Some("""
    SELECT strftime(time_bucket(INTERVAL 2 DAYS, ts, TIMESTAMP '1970-01-01'), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"""),
    sortCols = Seq("win_start", "event_type"))

  /** Streaming incremental dedup under the hard gate: documents arriving
    * as a STREAM (file source over the parquet, batch portion
    * doc_id ≥ 400) are gated against the landed corpus's content-hash set
    * via [[graft.streaming.Streams.dedupAgainstCorpus]] — a stateless
    * stream-static LEFT ANTI join — drained with `Trigger.AvailableNow`
    * into a memory sink. Oracle = the same exact-hash gate as batch SQL.
    * This is the streaming twin of `incremental_dedup`'s exact stage; the
    * verified LSH near-dup stage is `stream_near_dedup` below. */
  val streamIncDedup = Q("stream_inc_dedup", (s, d) => {
    import s.implicits._
    // the static side is the BUCKETED build-once corpus index (same
    // artifact the batch gate probes, VERDICT r07 finding 1): the
    // stream-static anti-join re-reads the static side every micro-batch,
    // so at scale it must be the pre-hashed index, never a per-trigger
    // re-derivation of the corpus
    val corpusHashes = graft.sources.DedupIndex.corpusHashes(s, d, 400L)
    val sink = s"stream_inc_dedup_sink_${sinkId.incrementAndGet()}"
    val stream = Tables.streamTable(s, d, "documents")
      .filter($"doc_id" >= 400)
    val q = graft.streaming.Streams.dedupAgainstCorpus(stream, corpusHashes, "text")
      .select($"doc_id", $"source")
      .writeStream.format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }, Some("""
    SELECT doc_id, source FROM documents
    WHERE doc_id >= 400 AND sha256(text) NOT IN
      (SELECT sha256(text) FROM documents WHERE doc_id < 400)
    ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Streaming VERIFIED near-dup gate under the hard gate — the twin of
    * `incremental_dedup`'s near stage: arriving documents (doc_id ≥ 400)
    * stream through `foreachBatch`, where each micro-batch runs
    * [[graft.streaming.Streams.nearDedupAgainstCorpus]] against the
    * static corpus band+signature index and appends survivors to
    * parquet (the landing-zone shape; a memory sink can't take
    * foreachBatch output). A doc is dropped only on a bucket collision
    * CONFIRMED by signature agreement ≥ 8/16 — same precision contract,
    * same oracle form, as the batch gate. */
  val streamNearDedup = Q("stream_near_dedup", (s, d) => {
    import s.implicits._
    import graft.operators.TextOps
    val boundary = graft.queries.LlmOps.CorpusBoundaryId
    // bucketed build-once band index as the static side — re-read per
    // micro-batch, so it must be the persisted index, not a per-trigger
    // recompute of every corpus signature (VERDICT r07 finding 1)
    val corpusBands = graft.sources.DedupIndex.corpusBands(s, d, boundary)
      .select($"band", $"band_key", $"sig".as("corpus_sig"))
    val out = java.nio.file.Files.createTempDirectory("graft_stream_near").toString
    val stream = Tables.streamTable(s, d, "documents")
      .filter($"doc_id" >= boundary)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.Streams
          .nearDedupAgainstCorpus(batch, corpusBands, "doc_id", "text")
          .select(col("doc_id"), col("source"))
          .write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a zero-batch drain leaves an empty directory
    s.read.schema("doc_id BIGINT, source STRING").parquet(out)
  }, Some(s"""
    WITH ${graft.queries.LlmOps.bandsWithSigCtes},
    near_dup AS (SELECT DISTINCT nb.doc_id FROM b nb
                 JOIN b cb ON nb.band = cb.band AND nb.band_key = cb.band_key
                  AND cb.doc_id < ${graft.queries.LlmOps.CorpusBoundaryId}
                 JOIN g ga ON ga.doc_id = nb.doc_id
                 JOIN g gc ON gc.doc_id = cb.doc_id
                 WHERE nb.doc_id >= ${graft.queries.LlmOps.CorpusBoundaryId}
                   AND ${graft.queries.LlmOps.sigAgreementSql("ga", "gc")} >= ${graft.operators.TextOps.verifyMinEqual})
    SELECT doc_id, source FROM documents
    WHERE doc_id >= ${graft.queries.LlmOps.CorpusBoundaryId}
      AND doc_id NOT IN (SELECT doc_id FROM near_dup)
    ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Streaming curation twin: the Gopher quality gate applied to
    * documents arriving as a STREAM — a stateless narrow map, so the
    * streamed plan is literally the batch plan per micro-batch (no
    * state store, no watermark needed) — drained with
    * `Trigger.AvailableNow` into a memory sink. Oracle = the same gate
    * as batch SQL, putting "stream curation == batch curation" under
    * the same hash gate as the dedup twins. At 100 TB this is the
    * shape of ingest-time filtering: reject junk the moment it lands,
    * at scan speed, instead of re-reading the corpus later. */
  val streamCurate = Q("stream_curate", (s, d) => {
    import s.implicits._
    val sink = s"stream_curate_sink_${sinkId.incrementAndGet()}"
    val rules = graft.operators.Curate
      .gopherRules(graft.operators.TextOps.tokens($"text")).toMap
    val q = Tables.streamTable(s, d, "documents")
      .select($"doc_id", rules("n_words").as("n_words"),
        rules("n_stop_distinct").as("n_stop_distinct"), rules("keep").as("k"))
      .filter($"k").drop("k")
      .writeStream.format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }, Some(s"""
    WITH ${Curation.gopherStatsCtes}
    SELECT doc_id, n_words, n_stop_distinct
    FROM s WHERE ${Curation.gopherKeepSql}
    ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  val all: Seq[Q] = Seq(streamBatchEquiv, streamIncDedup, streamNearDedup,
    streamCurate)
}
