package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sha2, timestamp_millis, window}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.10): the reference's
  * micro-batch loop re-expressed as real streams — file-arrival source
  * (S11: the S3-event-triggered Lambda), tumbling event-time windows with
  * watermark (St2/St3), at-least-once + dedup (St7).
  *
  * At scale: the file source lists new objects per trigger (the S3
  * notification analog), state lives in the checkpoint dir (K9 analog),
  * and `withWatermark` bounds window state exactly where the reference's
  * clamp-to-now logic did. */
object Streams {

  /** S11: file-arrival source over a JSON drop directory — one new file
    * per trigger batch, schema fixed up front (streams can't infer). */
  def jsonFileSource(spark: SparkSession, dir: String, schemaDdl: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schemaDdl)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // St5 backpressure
      .json(dir)

  /** St2+St3: tumbling event-time window counts with a watermark — late
    * rows beyond `lateness` are dropped and their windows finalized
    * (append mode emits each window exactly once, the exactly-once-ish
    * K6 analog for aggregations). */
  def tumblingCounts(events: DataFrame, tsCol: String,
      windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"), col("n"))

  /** St7: at-least-once delivery + dedup — drop redelivered events by id
    * within the watermark horizon (state bounded by the horizon). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, idCol: String,
      lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming incremental dedup: gate an arriving document stream
    * against the LANDED corpus with a stream-static LEFT ANTI join — the
    * streaming twin of the batch `incremental_dedup` query. The static
    * side is the corpus's content-hash set (at scale: the persisted
    * artifact `doc_dedup` maintains, re-read per micro-batch so corpus
    * growth between triggers is picked up); the stream side hashes each
    * arriving doc and forwards only unseen content. Stateless — the anti
    * join keeps no streaming state, so the horizon never grows; exact
    * cross-batch self-dedup composes via
    * [[dedupWithinWatermark]] upstream.
    *
    * @param corpusHashes single-column frame of sha256 hex digests of the
    *                     landed corpus (whatever its column is named) */
  def dedupAgainstCorpus(stream: DataFrame, corpusHashes: DataFrame,
      textCol: String): DataFrame = {
    // a malformed corpus frame must fail loudly — silently anti-joining on
    // an arbitrary first column of a multi-column frame would pass
    // everything through as "unseen" (ADVICE r06)
    require(corpusHashes.columns.length == 1,
      s"dedupAgainstCorpus expects a single-column hash frame; got " +
        s"[${corpusHashes.columns.mkString(", ")}]")
    // collision-safe internal name: a caller's own "h" column must survive
    val hc = "_graft_dedup_h"
    stream.withColumn(hc, sha2(col(textCol), 256))
      .join(corpusHashes.withColumnRenamed(
        corpusHashes.columns.head, hc), Seq(hc), "left_anti")
      .drop(hc)
  }

  /** VERIFIED near-dup gate for a micro-batch against a static corpus
    * band index — the streaming twin of `incremental_dedup`'s near stage,
    * run inside `foreachBatch` (signature computation is an aggregation,
    * so it gets batch semantics per trigger; the corpus side is the
    * persisted band+signature artifact, re-read per micro-batch at
    * scale). A batch doc is dropped only when it shares an LSH
    * (band, band_key) bucket with a corpus doc AND the minhash signature
    * agreement clears [[graft.operators.TextOps.verifyMinEqual]] — a bare
    * bucket collision never deletes a document (VERDICT r06 finding 1).
    *
    * @param corpusBands (band, band_key, corpus_sig) rows of the landed
    *                    corpus — what [[graft.operators.TextOps.bandTableFromSignatures]]
    *                    emits with `keepSig = true`, signature renamed */
  def nearDedupAgainstCorpus(batch: DataFrame, corpusBands: DataFrame,
      idCol: String, textCol: String,
      minEqual: Int = graft.operators.TextOps.verifyMinEqual): DataFrame = {
    require(corpusBands.columns.toSet == Set("band", "band_key", "corpus_sig"),
      s"corpus band index must be (band, band_key, corpus_sig); got " +
        s"[${corpusBands.columns.mkString(", ")}]")
    val bands = graft.operators.TextOps.bandTableFromSignatures(
      graft.operators.TextOps.minhashSignatures(batch, idCol, textCol),
      idCol, keepSig = true)
    val near = bands.join(corpusBands, Seq("band", "band_key"))
      .filter(graft.operators.TextOps.sigAgreement(col("sig"), col("corpus_sig")) >= minEqual)
      .select(col(idCol)).distinct()
    batch.join(org.apache.spark.sql.functions.broadcast(near), Seq(idCol), "left_anti")
  }

  /** Self-maintaining streaming dedup — the index-absorb loop: each
    * micro-batch is gated against the bucketed corpus index
    * ([[graft.sources.DedupIndex.dedupBatch]], exact + verified
    * near-dup), survivors are LANDED via `land`, then ABSORBED into the
    * index before the trigger completes — so a duplicate arriving any
    * number of batches later is dropped. The index IS the cross-batch
    * state: bucketed parquet on disk, unbounded by watermarks, shared
    * with every batch consumer — where `dropDuplicatesWithinWatermark`
    * (St7) bounds its state store by the watermark and forgets, and
    * [[dedupAgainstCorpus]]'s static side is frozen at query start,
    * this loop remembers everything it has ever admitted.
    *
    * Crash ordering (at-least-once by construction): land runs BEFORE
    * absorb, so a failure between them redelivers a batch the index
    * does not know yet — it lands again (duplicate in the landing zone,
    * dedupable downstream by content hash), never silently disappears.
    * The reverse order would lose documents: absorbed-but-unlanded rows
    * gate their own redelivery out. The kept frame is pinned
    * (persist+count) before landing — a lazy frame re-evaluated after
    * the absorb would gate itself out (same trap the
    * [[graft.sources.DedupIndex.absorb]] scaladoc documents).
    *
    * `bloomBuckets > 0` enables the Bloom pre-gate END-TO-END: each
    * batch probes the index's sidecar ([[graft.sources.DedupIndex
    * .ensureBloom]]) so provably-new rows skip the exact anti-join, and
    * the SAME maintenance step grows the sidecar BEFORE the hash-table
    * absorb ([[graft.sources.DedupIndex.absorbBloom]]) — sidecar ahead
    * of the hash table = extra false positives (safe, the exact join
    * removes them); sidecar behind it = false negatives (redelivered
    * docs bypass the gate and land twice). Every crash point in the
    * land → bloom → absorb order preserves `sidecar ⊇ hash table`. */
  def indexDedupStream(stream: DataFrame, idx: graft.sources.DedupIndex.Index,
      idCol: String, textCol: String, checkpointDir: Option[String] = None,
      bloomBuckets: Int = 0)(
      land: DataFrame => Unit): StreamingQuery = {
    val w = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val gated =
          if (bloomBuckets > 0) {
            val bloom = graft.sources.DedupIndex.ensureBloom(s, idx, bloomBuckets)
            // geometry from the sidecar's version metadata — the gate
            // itself runs no count() probe job per micro-batch
            val (b, _) = graft.sources.DedupIndex.sidecarGeometry(s, idx)
            graft.sources.DedupIndex.dedupBatchBloom(batch,
              s.table(idx.hashes), s.table(idx.bands), bloom,
              idCol, textCol, bloomBuckets = b)
          } else graft.sources.DedupIndex.dedupBatch(s, idx, batch)
        val kept = gated
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = kept.count() // pin the gate's verdict before the index changes
          land(kept)
          // an all-duplicate batch (e.g. a replayed trigger) has nothing
          // to absorb: skip the index append AND the sidecar commit —
          // empty maintenance versions are pure write amplification
          if (n > 0) {
            if (bloomBuckets > 0)
              graft.sources.DedupIndex.absorbBloom(s, idx, kept, textCol)
            // returned handle discarded: this loop holds one Index for the
            // stream's life and no compactor runs inside a trigger
            graft.sources.DedupIndex.absorb(s, idx, kept, idCol, textCol)
            ()
          }
        } finally kept.unpersist()
      }
      .trigger(Trigger.AvailableNow())
    checkpointDir.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  /** Open-session state for [[sessionizeStream]], keyed by user. Times
    * are event-time MICROSECONDS (the events fixture has sub-ms
    * precision; `Timestamp.getTime` would truncate it). */
  case class SessionState(startUs: Long, endUs: Long, n: Long)

  /** A CLOSED session — emitted once, when the event-time watermark
    * passes the session's gap horizon (or an in-batch gap closes it). */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n: Long)

  /** Custom-state streaming sessionization (brief §streaming:
    * `flatMapGroupsWithState` for state the built-in operators can't
    * express): per-user activity sessions with an inactivity gap,
    * emitted ONLY when closed — by a later in-batch event past the gap,
    * or by the event-time timeout once the watermark passes
    * `end + gap`. The batch twin is the oracle-gated `session_window`
    * row; the spec proves stream == batch on the closed set.
    *
    * Input must carry `user_id` (long), an event-time `ts` (timestamp,
    * ALREADY watermarked by the caller — the watermark drives the
    * timeout) and `us` (= unix_micros(ts)).
    *
    * At scale this is the right state shape: one small fixed-size state
    * record per ACTIVE user (not per event), hash-partitioned by user;
    * the state store bounds memory by active-user cardinality and the
    * watermark reaps it — the same reasoning the reference's
    * clamp-to-now window state applied, generalized to per-key state. */
  def sessionizeStream(events: DataFrame, gapUs: Long): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    events.select(col("user_id"), col("ts"), col("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startUs, s.endUs, s.n))
          } else {
            // fold the batch's events (sorted — micro-batches aren't
            // ordered) into the open session, closing on in-batch gaps
            val sorted = batch.map(_._3).toSeq.sorted
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.endUs <= gapUs =>
                  open = Some(SessionState(s.startUs, math.max(s.endUs, t), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, s.startUs, s.endUs, s.n)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // event-time timeout is millisecond-granular: round UP so
              // the timeout never fires before the true gap horizon
              state.setTimeoutTimestamp((s.endUs + gapUs + 999) / 1000)
            }
            closed.iterator
          }
      }
  }

  /** A doc admitted by [[tokenBudgetStream]], with the tokens consumed
    * before it within its source. `out_of_order` surfaces an
    * ordering-contract violation: this doc's id is ≤ the largest id its
    * source had already delivered in an EARLIER micro-batch, so the
    * admitted set may diverge from the batch `token_budget` twin. */
  case class BudgetedDoc(doc_id: Long, source: String, n_tokens: Long,
      cum_before: Long, out_of_order: Boolean)

  /** Streaming token-budget admission — the cross-batch twin of the
    * batch `token_budget` row: documents arrive over many micro-batches,
    * and each SOURCE's running token consumption persists as keyed state
    * (one long per source), so admission decisions made in batch 1 bind
    * batch 100. A doc is admitted iff its source's tokens consumed
    * BEFORE it are under budget (boundary doc included, same contract as
    * the batch row); once a source is exhausted its state is a tombstone
    * that rejects everything after.
    *
    * Within a micro-batch, docs are folded in doc_id order, so feeding
    * batches in doc order reproduces the batch row EXACTLY
    * (StreamingSpec proves it). The cross-batch half of that ordering
    * contract is ENFORCED, not assumed (ADVICE r07): the state carries
    * the max doc_id each source has delivered, and any later batch
    * delivering a smaller id marks its rows `out_of_order = true` — the
    * violation is surfaced per row instead of silently diverging from
    * the batch twin. State is one fixed-size record per source —
    * ingest-time corpus mixing at any scale, without re-reading landed
    * data. */
  def tokenBudgetStream(docs: DataFrame, budget: Long): org.apache.spark.sql.Dataset[BudgetedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    docs.select(col("source"), col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), BudgetedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[(String, Long, Long)],
            state: GroupState[(Long, Long)]) =>
          var (consumed, maxSeen) = state.getOption.getOrElse((0L, Long.MinValue))
          val priorMax = maxSeen // ids from earlier batches only
          val admitted = batch.toSeq.sortBy(_._2).flatMap { case (_, id, n) =>
            if (id > maxSeen) maxSeen = id
            if (consumed < budget) {
              val row = BudgetedDoc(id, source, n, consumed, id <= priorMax)
              consumed += n
              Some(row)
            } else None
          }
          state.update((consumed, maxSeen))
          admitted.iterator
      }
  }

  /** The reference's S3-event → Lambda → store loop as ONE streaming
    * pipeline (`lambda_function.py:27-95`): match documents arriving in a
    * drop directory are ETL'd per micro-batch
    * ([[graft.driver.Pipeline.matchEtl]]) and landed through the
    * event-time partitioned sink. `Trigger.AvailableNow` drains what has
    * arrived and stops — the batch-driven cadence of the reference's cron
    * loop — while the checkpoint makes restarts exactly-once at file
    * granularity: a resumed query re-processes NOTHING already committed,
    * only files that arrived since. */
  def matchPipeline(spark: SparkSession, inDir: String, schema: StructType,
      outPath: String, checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("multiLine", true)
      .option("maxFilesPerTrigger", 1) // St5 backpressure
      .json(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val players = graft.driver.Pipeline.matchEtl(batch)
            .withColumn("event_ts", timestamp_millis(col("gameCreation")))
          graft.sinks.Writers.partitionedByEventTime(players, "event_ts", outPath)
        }
      }
      .start()
}
