package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Refusal of an absorb that would grow an index past
  * [[Vectors.AbsorbStaleFactor]]× its stamped design point — the
  * "rebuild is due" terminal state. Distinct from [[TornIndexException]]
  * (ADVICE r19: both used to surface as bare IllegalStateException, so a
  * harness asserting a gate trip could mistake a torn-clone refusal for
  * a successful staleness trip and rebuild over a broken index). Extends
  * IllegalStateException so pre-r20 catch sites keep working. */
final class StaleIndexException(msg: String) extends IllegalStateException(msg)

/** Refusal to gate/route/compact against a stamped index whose
  * assignments dir lacks its job-commit marker — a rebuild crashed
  * between the stamp publish and the assignments commit. The fix is
  * re-running [[Vectors.writeIndex]], never `allowStale`. */
final class TornIndexException(msg: String) extends IllegalStateException(msg)

/** Vector similarity primitives for embedding columns (`array<float>`) —
  * builder brief: brute-force cosine top-k baseline + bucketed variant as
  * the 100 TB scale path.
  *
  * Determinism contract (shared with the DuckDB oracle): every elementwise
  * product is computed in double, scaled by 1e12 and rounded to an integer
  * — summing exactly-representable integers (< 2^53) is order-independent,
  * so Spark's partitioned sums and DuckDB's sequential list_sum produce
  * bit-identical dot products and norms; cosine = dot / sqrt(n2a·n2b) is
  * then a deterministic IEEE expression of those integers.
  */
object Vectors {

  /** Scaled-integer dot product (as an integer-valued double) — the
    * native codegen'd [[graft.functions.ScaledDot]] (`scaled_dot`,
    * registered by [[graft.GraftExtensions]]); bit-identical to
    * [[dotScaledHof]] and to the DuckDB twins. */
  def dotScaled(a: Column, b: Column): Column =
    call_function("scaled_dot", a, b)

  /** Scaled-integer squared norm = `scaled_dot(a, a)`. */
  def normScaled(a: Column): Column =
    call_function("scaled_dot", a, a)

  /** The higher-order-function formulation `dotScaled` replaces. Kept as
    * the differential-test reference (and for sessions without
    * [[graft.GraftExtensions]]): `aggregate`/`zip_with` are
    * CodegenFallback — an interpreter loop per row — which is exactly
    * what the native expression removes from the similarity kernels. */
  def dotScaledHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => round(x.cast("double") * y.cast("double") * 1e12)),
      lit(0.0), (acc, v) => acc + v)

  /** HOF twin of [[normScaled]] (differential-test reference). */
  def normScaledHof(a: Column): Column =
    aggregate(
      transform(a, x => round(x.cast("double") * x.cast("double") * 1e12)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity from scaled dot + scaled squared norms (the 1e12
    * scales cancel). */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / sqrt(n2a * n2b)

  /** IVF index build: seed centroids from the first k vectors, one
    * Lloyd iteration with DETERMINISTIC means (per-dimension scaled-int
    * sums ÷ counts — no float accumulation order anywhere). Returns
    * (centroid_id, centroid: array<double>). Plan shape at scale: assign =
    * broadcast(centroids) nested-loop + partial top-1; means = posexplode
    * dims → grouped sum/count (partial-agg, one shuffle on (cid, dim)). */
  def buildCentroids(v: DataFrame, idCol: String, vecCol: String, k: Int,
      samplePeriod: Long = 1L): DataFrame = {
    val seeds = v.filter(col(idCol) < k)
      .select(col(idCol).cast("int").as("centroid_id"),
        transform(col(vecCol), x => x.cast("double")).as("centroid"))
    // Lloyd trains on a deterministic hash-sample (AnnGeometry
    // .lloydSamplePeriod — ~64·k points; a FULL pass is n·k = n^1.5 at
    // the k≈√n contract, the measured 1045 s sf100 row). Seeds are
    // always in the training set so no cell can empty out and k is
    // preserved; period 1 = the exact full-corpus Lloyd.
    val lloydIn = if (samplePeriod <= 1L) v else v.filter(
      pmod(graft.queries.hash60(
        concat(lit("ivfs:"), col(idCol).cast("string"))), lit(samplePeriod)) === 0 ||
      col(idCol) < k)
    val assigned = ivfAssign(lloydIn, idCol, vecCol, seeds)
    // SHUFFLE_HASH: `assigned` is the narrow (id, centroid) frame; an
    // unhinted plan sort-merges this join and externally sorts the
    // VECTOR side — sort width = the embedding payload (8 GB of
    // float arrays at 20 M × 96-dim), the recurring anti-pattern. The
    // hash build is per-partition small (12 B/row) and the vector side
    // streams.
    val sums = lloydIn.join(assigned.hint("shuffle_hash"), idCol)
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(sum(round(col("x").cast("double") * 1e7)).as("sx"), count(lit(1)).as("n"))
      .select(col("centroid_id"), col("dim"), (col("sx") / 1e7 / col("n")).as("m"))
    sums.groupBy(col("centroid_id"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
        e => e.getField("m")).as("centroid"))
  }

  /** Assign each vector to its nearest centroid by cosine (broadcast the
    * centroid table). Top-1 is an ARGMAX, so it must be a hash
    * AGGREGATE — never a window (a window needs a per-partition SORT of
    * the full corpus×centroid score stream — n·k rows, 9×10¹⁰ at 20 M
    * vectors under the k≈√n contract) — and never `max(struct(...))`
    * either: a struct aggregation buffer is not a mutable fixed-width
    * type, so HashAggregateExec silently falls back to SortAggregate
    * and sorts the same n·k stream (measured: 8 GiB OOM at sf100,
    * `r16m/sf100_subset/` — the round-16 incident
    * [[graft.functions.ArgMaxBy]] exists to close). `arg_max_by(id,
    * cos)` holds (best cos, best id) as two primitive buffer slots —
    * one 16-byte hash-map entry per vector in the partition — and
    * reproduces the (cos DESC, centroid_id ASC) ordering bit-for-bit;
    * the only exchange carries n compact (id, best) rows. Same argmax
    * shape as `semantic_decontam`'s corpus×benchmark pass (round-7
    * finding). */
  def ivfAssign(v: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = v.select(col(idCol), col(vecCol).as("_v"), normScaled(col(vecCol)).as("_n2"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        cosine(dotScaled(col("_v"), col("centroid")),
          col("_n2"), normScaled(col("centroid"))).as("_c"))
    scored.groupBy(col(idCol))
      .agg(call_function("arg_max_by", col("centroid_id"), col("_c"))
        .cast("int").as("centroid_id"))
  }

  /** Corpus→centroid assignment through a COARSE ROUTING level (the
    * two-level/IMI shape): with the k≈√n contract a flat assignment is
    * n·k = n^1.5 exact cosines — measured at sf100 (2 M × k=1415):
    * `ivf_knn` 1045.6 s, one decade from infeasible
    * (`r16m/sf100_subset/`, PERF.md round-16 §6). Here:
    *  - coarse cells = the first `coarseK` (≈√k) centroids;
    *  - each FINE centroid registers in its top-2 coarse cells (k·√k
    *    dots — tiny, broadcast both ways; the duplication buys back
    *    boundary error on the index side, so the corpus side stays
    *    single-pass);
    *  - each vector: nearest coarse cell (n·√k stream through the
    *    arg_max_by hash agg), then exact argmax over that cell's ~2k/√k
    *    fines — n·3√k total.
    * The result is an approximation of the flat argmax (a vector whose
    * true nearest fine lives outside its coarse cell gets its best
    * IN-cell fine) — exactly the approximation IVF assignment already
    * is; what the oracle pins is the RULE, replayed bit-for-bit from
    * the same constants (`AnnGeometry.ivfCoarseK`). No cell is ever
    * empty: cos(c_j, c_j) = 1 keeps coarse centroid j in its own cell.
    * `coarseK = 1` degenerates to the flat exact assignment (one cell
    * holding every fine). */
  def ivfAssignRouted(v: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, coarseK: Int): DataFrame = {
    val coarse = broadcast(centroids.filter(col("centroid_id") < coarseK)
      .select(col("centroid_id").as("coarse_id"), col("centroid").as("_cc")))
    // fine → its top-2 coarse cells (k·coarseK rows: window is fine here)
    val cells = broadcast(topKPerKey(
      centroids.crossJoin(coarse)
        .select(col("centroid_id"), col("coarse_id"),
          cosine(dotScaled(col("centroid"), col("_cc")),
            normScaled(col("centroid")), normScaled(col("_cc"))).as("_fc")),
      col("centroid_id"), col("_fc"), col("coarse_id"), 2)
      .select(col("coarse_id"), col("centroid_id"))
      .join(centroids, "centroid_id"))
    val vs = v.select(col(idCol), col(vecCol).as("_v"),
      normScaled(col(vecCol)).as("_n2"))
    val vCoarse = vs.crossJoin(coarse)
      .select(col(idCol), col("coarse_id"),
        cosine(dotScaled(col("_v"), col("_cc")),
          col("_n2"), normScaled(col("_cc"))).as("_c"))
      .groupBy(col(idCol))
      .agg(call_function("arg_max_by", col("coarse_id"), col("_c"))
        .cast("int").as("coarse_id"))
    vs.join(vCoarse.hint("shuffle_hash"), Seq(idCol))
      .join(cells, Seq("coarse_id"))
      .select(col(idCol), col("centroid_id"),
        cosine(dotScaled(col("_v"), col("centroid")),
          col("_n2"), normScaled(col("centroid"))).as("_c"))
      .groupBy(col(idCol))
      .agg(call_function("arg_max_by", col("centroid_id"), col("_c"))
        .cast("int").as("centroid_id"))
  }

  /** IVF probe: answer each query from its `nprobe` nearest centroid
    * buckets only — the 1/(k/nprobe) corpus fraction that survives 100 TB.
    * Exact within the probed buckets; recall vs brute force is the
    * nprobe/k tradeoff. One-shot form: assigns the corpus here; the
    * production build-once/probe-many shape is [[writeIndex]] +
    * [[ivfSearchIndexed]]. */
  def ivfSearch(v: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, qIdCol: String, qVecCol: String,
      nprobe: Int, k: Int, routeCoarseK: Int = 1): DataFrame =
    // SHUFFLE_HASH: same reason as buildCentroids' sums join — unhinted,
    // this sort-merges and externally sorts the WIDE vector side; the
    // narrow (id, centroid) frame is the per-partition hash build.
    // routeCoarseK > 1 = the two-level corpus assignment (the scale
    // path; queries still route against ALL centroids — 10·k is cheap)
    searchAssigned(
      v.join(ivfAssignRouted(v, idCol, vecCol, centroids, routeCoarseK)
        .hint("shuffle_hash"), idCol),
      idCol, vecCol, centroids, queries, qIdCol, qVecCol, nprobe, k)

  /** Build the IVF index ONCE and persist it: `$path/centroids`
    * (centroid_id, centroid) and `$path/assignments` (id, centroid_id)
    * parquet. The corpus assignment to the FINAL centroids is computed
    * here — probes read it instead of re-assigning the corpus per query
    * batch, which is the whole economics of IVF at 100 TB (the index
    * build's two assignment passes — seeds for the Lloyd step, final for
    * the inverted lists — amortize over every probe that follows).
    * Centroids are read back from disk before assigning so the persisted
    * assignment matches the persisted centroids bit-for-bit. */
  def writeIndex(v: DataFrame, idCol: String, vecCol: String, k: Int,
      path: String, samplePeriod: Long = 1L, routeCoarseK: Int = 1,
      knownN: Long = -1L): Unit = {
    // design-point stamp: k (and every derived geometry constant) was
    // sized for THIS corpus; absorbs check against it (the maintenance
    // half of the AnnGeometry contract — VERDICT r16 missing #3).
    // builtN comes from the INPUT corpus, counted before anything is
    // written, and the stamp lands BEFORE the assignments overwrite
    // (ADVICE r17: it used to be re-counted from the just-written
    // parquet after the overwrite — one extra full read, and a crash in
    // between left a rebuilt index carrying the PREVIOUS build's stamp,
    // gating later absorbs against the wrong design point; now a crash
    // mid-assignments leaves a visibly torn assignments dir under an
    // already-correct stamp — "visibly" made mechanical in round 19:
    // the absorb gate REFUSES a stamped index whose assignments dir
    // lacks its _SUCCESS job-commit marker, ADVICE r18).
    // The marker is RETRACTED before anything is overwritten (r19
    // review): centroids land first, so a crash between the centroids
    // overwrite and the stamp would otherwise leave NEW centroids
    // under the OLD stamp and OLD assignments with their _SUCCESS
    // intact — a mixed build the fence would accept. Deleting the
    // marker up front makes assignments/_SUCCESS the single commit
    // marker for the WHOLE rebuild: absent through every intermediate
    // state, restored only by the final assignments job commit.
    // knownN: callers that already counted the corpus (the rebuild path
    // derives k from that count) pass it through instead of paying a
    // second full count() scan here
    val builtN = if (knownN >= 0) knownN else v.count()
    val f = graft.sources.ArtifactStore.fs(path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/assignments/_SUCCESS")
    if (f.exists(marker)) f.delete(marker, false)
    buildCentroids(v, idCol, vecCol, k, samplePeriod)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val cent = v.sparkSession.read.parquet(s"$path/centroids")
    writeAnnMeta(path, builtN, k, routeCoarseK,
      hasMarker = markersOn(v.sparkSession))
    ivfAssignRouted(v, idCol, vecCol, cent, routeCoarseK)
      .write.mode("overwrite").parquet(s"$path/assignments")
  }

  /** Factor by which an absorbed corpus may outgrow its index's
    * build-time size before [[absorbIndex]] refuses: at 2× the contract
    * geometry (k ≈ √n, band bits ~ log2(n/bucket)) is one decade's
    * drift from its design point — inverted lists are 2× their sized
    * length and `ivf_recall` is already the audit that a rebuild is
    * due. Below it, absorb-without-retrain is the intended cheap path. */
  val AbsorbStaleFactor = 2L

  /** Session escape hatch for [[absorbIndex]]/[[graft.sources.DedupIndex
    * .absorb]]'s staleness refusal (`spark.graft.absorb.allowStale`):
    * the operator keeps appending at frozen geometry and the caller
    * owns the recall consequences. */
  def allowStaleAbsorb(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.getOption("spark.graft.absorb.allowStale").contains("true")

  /** Absolute floor under which the staleness RATIO is meaningless and
    * absorbs go unchecked: a 3-doc index "exceeding 2× its design
    * point" at 7 docs stresses nothing — derived geometry (k ≈ √n,
    * bucket layouts) only starts to matter once the corpus outgrows a
    * handful of bucket files (~2^16 rows, the same order as the
    * exhaustive-pairing guard ceiling). Overridable per session via
    * `spark.graft.absorb.staleFloorRows` (specs pin the gate at toy
    * sizes by setting 0). */
  val AbsorbStaleFloorRows: Long = 1L << 16

  def absorbStaleFloor(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.getOption("spark.graft.absorb.staleFloorRows").map(_.toLong)
      .getOrElse(AbsorbStaleFloorRows)

  /** The design-point stamp's content. `hasMarker` records — AT WRITE
    * TIME — whether the building session emitted `_SUCCESS` job-commit
    * markers (ADVICE r19: the torn-rebuild fence used to read the
    * READER's Hadoop conf, so an index legitimately written by a
    * marker-disabled session was permanently refused by any
    * marker-enabled reader). `None` = pre-r20 stamp that didn't record
    * the expectation; the fence then falls back to the reader's conf,
    * the documented cross-session asymmetry of those older stamps. */
  final case class AnnMeta(builtN: Long, k: Int, routeK: Int,
      hasMarker: Option[Boolean])

  /** Stamp the design point via temp file + rename (ADVICE r17): the
    * rename publishes a complete document or nothing — a reader can
    * never observe a half-written stamp. (The delete-then-rename pair
    * is not jointly atomic on HDFS-semantics stores; a crash exactly
    * between them leaves NO stamp, which absorbs treat as a pre-stamp
    * index — fail-open and visible, never a stale design point.) */
  private[graft] def writeAnnMeta(path: String, builtN: Long, k: Int,
      routeK: Int, hasMarker: Boolean = true): Unit = {
    val f = graft.sources.ArtifactStore.fs(path)
    val fin = new org.apache.hadoop.fs.Path(path, "_graft_ann_meta.json")
    val tmp = new org.apache.hadoop.fs.Path(path,
      s"_graft_ann_meta.json.tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    val out = f.create(tmp, true)
    out.write((s"""{"built_n": $builtN, "k": $k, "route_k": $routeK, """ +
      s""""has_marker": $hasMarker}""").getBytes("UTF-8"))
    out.close()
    if (f.exists(fin)) f.delete(fin, false)
    if (!f.rename(tmp, fin))
      throw new java.io.IOException(s"could not publish ANN meta stamp at $fin")
  }

  /** Parse the stamp. `routeK` defaults to 1 (flat assignment) for
    * stamps written before round 18 recorded the build's routing;
    * `hasMarker` is `None` for stamps written before round 20 recorded
    * the marker expectation. */
  private[graft] def readAnnMeta(path: String): Option[AnnMeta] = {
    val f = graft.sources.ArtifactStore.fs(path)
    val p = new org.apache.hadoop.fs.Path(path, "_graft_ann_meta.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      for {
        n <- """"built_n"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
        k <- """"k"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      } yield AnnMeta(n, k,
        """"route_k"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt).getOrElse(1),
        """"has_marker"\s*:\s*(true|false)""".r.findFirstMatchIn(s)
          .map(_.group(1) == "true"))
    }
  }

  /** Does this session write `_SUCCESS` job-commit markers? Recorded
    * into the stamp at build time; the fence's fallback for pre-r20
    * stamps. */
  private def markersOn(s: org.apache.spark.sql.SparkSession): Boolean =
    s.sparkContext.hadoopConfiguration.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)

  /** Torn-rebuild fence (ADVICE r18/r19), shared by every consumer of a
    * stamped index — [[absorbIndex]], [[ivfSearchIndexed]], and
    * [[graft.Maintain]]'s ann-index compaction (ADVICE r19: probes and
    * compaction against a stamp-published-but-torn assignments dir used
    * to run unchecked and return silently wrong results; only absorbs
    * were protected). [[writeIndex]] publishes the meta stamp BEFORE the
    * assignments overwrite and retracts `assignments/_SUCCESS` up front,
    * so the marker is the single commit witness for the whole rebuild:
    * a stamp therefore implies a complete assignments commit. The
    * expectation that a marker EXISTS comes from the stamp itself
    * (`has_marker`, recorded by the building session); pre-r20 stamps
    * fall back to the reading session's conf. Pre-stamp indexes (no
    * meta) are never fenced — fail-open and visible, as everywhere in
    * the gate. */
  private[graft] def requireCommittedAssignments(
      s: org.apache.spark.sql.SparkSession, indexPath: String,
      meta: Option[AnnMeta]): Unit =
    meta.foreach { m =>
      if (m.hasMarker.getOrElse(markersOn(s)) &&
          !graft.sources.ArtifactStore.exists(s"$indexPath/assignments/_SUCCESS"))
        throw new TornIndexException(
          s"index at $indexPath carries a design-point stamp but its " +
            "assignments dir has no _SUCCESS marker — a rebuild crashed " +
            "between the stamp publish and the assignments commit; re-run " +
            "writeIndex before absorbing, probing, or compacting")
    }

  /** Absorb new vectors into a persisted index WITHOUT retraining: assign
    * them against the FROZEN centroids and append to the inverted lists —
    * the standard IVF maintenance move (posting lists grow per batch;
    * centroids retrain only on an explicit rebuild via [[writeIndex]]).
    * An absorbed vector is immediately findable by its own embedding:
    * query routing and list assignment run the same argmax over the same
    * centroids, so the probed cell always contains the twin (VectorsSpec
    * pins it). Recall drifts only as far as the data distribution drifts
    * from the centroids' training set — `ivf_recall` is the audit for
    * when a rebuild is due.
    *
    * Staleness gate (round 17 — the maintenance half of the
    * [[AnnGeometry]] derived-geometry contract): the index's design
    * point (build-time corpus size, stamped by [[writeIndex]]) bounds
    * how far absorbs may grow it. Past [[AbsorbStaleFactor]]× the
    * stamped size, k ≈ √n and the list lengths are a decade off their
    * contract and the absorb REFUSES (a standing index quietly probed
    * at the wrong geometry is the silent-wrong-cost failure the
    * contract exists to prevent) — rebuild via [[writeIndex]], or set
    * `spark.graft.absorb.allowStale=true` to accept the drift
    * explicitly. Below [[AbsorbStaleFloorRows]] total rows the ratio is
    * meaningless (nothing about a toy layout is stressed) and absorbs
    * go unchecked; pre-stamp indexes (no meta file) likewise. */
  /** `routeCoarseK` < 0 (the default) assigns the batch THROUGH THE SAME
    * two-level routing the index was built with (the `route_k` meta
    * stamp; 1 = flat for pre-r18 stamps): round 18's fourth-decade
    * absorb measurement caught this method flat-assigning a 2 M-vector
    * batch against k≈4472 centroids — the n·k = n^1.5 tax the
    * [[AnnGeometry.ivfCoarseK]] contract exists to remove — at 510.9 s
    * (`r18m/absorb_sf1000.json`), ~20× the routed cost. A routed absorb
    * is assignment-CONSISTENT with the bulk build: an absorbed vector
    * lands exactly where [[writeIndex]] would have put it. Pass an
    * explicit value to override (1 forces the flat exact argmax). */
  def absorbIndex(indexPath: String, newV: DataFrame, idCol: String,
      vecCol: String, routeCoarseK: Int = -1): Unit = {
    val s = newV.sparkSession
    // MUTATOR claim at the index ROOT (ADVICE r19: the append used to
    // run unclaimed, so the Maintain scaladoc's "under the same root
    // claim" was only true of the compactor's side): absorbs, ann-index
    // compaction, and [[rebuildIndex]] now all serialize on
    // `$indexPath/_graft_root_claim` — an absorb can no longer append
    // into the compactor's rename-in/delete window, and a rebuild can
    // never interleave with a racing absorb. The claim lives at the
    // ROOT, not inside assignments/, because writeIndex's overwrite
    // replaces that whole dir (a claim inside it would be deleted mid-
    // hold). Plain READERS still never block and may transiently
    // observe duplicated rows during a compaction swap — the same
    // caveat every non-transactional table format carries, documented
    // at [[graft.Maintain]].
    graft.sources.ArtifactStore.withRootClaim(
        graft.sources.ArtifactStore.fs(indexPath), indexPath) {
    val meta = readAnnMeta(indexPath)
    // torn-rebuild fence (ADVICE r18/r19) — shared helper; see
    // [[requireCommittedAssignments]]. BuildOnce-managed artifacts were
    // already fenced by their own _SUCCESS predicates; this covers
    // direct writeIndex/absorbIndex users.
    requireCommittedAssignments(s, indexPath, meta)
    meta.foreach { m =>
      // the standing-index side of the gate reads parquet FOOTERS, not
      // rows (ADVICE r17 / VERDICT r17 #3: a full count() scan of the
      // assignments per absorb made the gate O(index), dominating small
      // batches); the batch side stays a real count — batch-sized by
      // definition, and the assignment pass below re-reads newV anyway
      val existing =
        graft.sources.ArtifactStore.parquetRowCount(s"$indexPath/assignments")
      val incoming = newV.count()
      if (existing + incoming > math.max(
            AbsorbStaleFactor * m.builtN, absorbStaleFloor(s)) &&
          !allowStaleAbsorb(s))
        throw new StaleIndexException(
          s"absorbIndex: index at $indexPath was built for ${m.builtN} " +
            s"vectors (k=${m.k}); absorbing $incoming more onto $existing " +
            s"exceeds ${AbsorbStaleFactor}x its design point — rebuild " +
            "with writeIndex/rebuildIndex (k re-derives from the grown " +
            "corpus; graft.Maintain runs it given the corpus), or set " +
            "spark.graft.absorb.allowStale=true to append at the frozen " +
            "geometry anyway (audit recall with ivf_recall)")
    }
    val cent = s.read.parquet(s"$indexPath/centroids")
    val rk = if (routeCoarseK > 0) routeCoarseK
      else meta.map(_.routeK).getOrElse(1)
    ivfAssignRouted(newV, idCol, vecCol, cent, rk)
      .write.mode("append").parquet(s"$indexPath/assignments")
    }
  }

  /** What a [[rebuildIndex]] did, for records and reports: the
    * re-derived design point, the equivalence-probe outcome, and the
    * two walls (the rebuild itself vs the verification pass). */
  final case class RebuildStats(n: Long, k: Int, samplePeriod: Long,
      coarseK: Int, probes: Long, consistent: Long, searchHits: Long,
      rebuildSec: Double, verifySec: Double)

  /** The gate-tripped rebuild RUNBOOK as a production operator (VERDICT
    * r19 #1: the terminal path was measured by the [[graft.AbsorbScale]]
    * harness — refuse → re-writeIndex → equivalence,
    * `r19m/absorb_rebuild_sf100.json` — but no library entry performed
    * it, so an operator's cron learned of the 2× staleness trip as an
    * absorb exception with no tool to act on; [[graft.Maintain]] now
    * calls this given a corpus). Under the index-root mutator claim
    * (absorbs and compactions wait, or this rebuild waits for them):
    *
    *  1. re-derive the design point from the GROWN corpus — k ≈ √n,
    *     Lloyd on a ~64·k hash-sample, √k coarse routing — the same
    *     [[AnnGeometry]] derivation the original build stamped;
    *  2. [[writeIndex]] over the corpus at that design point (the
    *     commit-marker fence makes every crash window mechanical:
    *     `assignments/_SUCCESS` is retracted first, restored only by
    *     the final job commit);
    *  3. BEFORE releasing the claim, prove the rebuilt index serves:
    *     (a) assignment CONSISTENCY — `probeQueries` sampled corpus
    *     vectors, re-routed through the same two-level assignment the
    *     rebuild used, must each sit in exactly the cell the persisted
    *     assignments say (exact by construction: assignment depends
    *     only on the embedding and the frozen centroids — a hard
    *     require); (b) a SEARCH-PATH recall floor (VERDICT r19 #2:
    *     consistency alone cannot flag a routing regression) —
    *     identical-embedding twins of the sampled vectors, probed
    *     through [[ivfSearchIndexed]] at nprobe=2/k=3, must find their
    *     originals at ≥ `recallFloor` of the sample. Exact top-nprobe
    *     query routing may legitimately diverge from the coarse-routed
    *     assignment on boundary cells (the measured 4/5 toy-geometry
    *     case), which is why this is a floor, not an equality.
    *
    * A failed gate throws inside the claim — the index is left stamped
    * and committed (writeIndex completed), the claim releases, and the
    * operator holds the refusal with the failing counts.
    *
    * The claim's staleness horizon is raised to 60 min here: a reaping
    * sibling compares the claim's age against its OWN horizon, and a
    * fourth-decade rebuild (~16× a routine absorb) can outlive the
    * 10-min default an absorber would reap at. Schedule rebuilds in
    * maintenance windows; racing absorbs against a live rebuild wait
    * out their `maxWaitMs` and fail fast. */
  def rebuildIndex(indexPath: String, corpus: DataFrame, idCol: String,
      vecCol: String, knownN: Long = -1L, recallFloor: Double = 0.6,
      probeQueries: Int = 5): RebuildStats = {
    val s = corpus.sparkSession
    val f = graft.sources.ArtifactStore.fs(indexPath)
    graft.sources.ArtifactStore.withRootClaim(f, indexPath,
        claimStaleMs = 60L * 60 * 1000) {
      val n2 = if (knownN >= 0) knownN else corpus.count()
      require(n2 > 0, s"rebuildIndex: empty corpus for $indexPath")
      val k2 = AnnGeometry.ivfK(n2)
      val sp2 = AnnGeometry.lloydSamplePeriod(n2, k2)
      val ck2 = AnnGeometry.ivfCoarseK(k2)
      val t0 = System.nanoTime()
      writeIndex(corpus, idCol, vecCol, k2, indexPath,
        samplePeriod = sp2, routeCoarseK = ck2, knownN = n2)
      val rebuildSec = (System.nanoTime() - t0) / 1e9
      // ---- equivalence gates, inside the claim ----------------------
      val t1 = System.nanoTime()
      val sample = corpus.orderBy(col(idCol)).limit(probeQueries)
      val probes = sample.count()
      require(probes > 0, s"rebuildIndex: empty probe sample for $indexPath")
      // fresh query ids clear every real id (same derivation as the
      // AbsorbScale harness: max-id floor at 2^32, never a density
      // assumption)
      val maxId = corpus.agg(max(col(idCol)).cast("long")).first().getLong(0)
      val shift = math.max(1L << 32, maxId + 1)
      val cent2 = s.read.parquet(s"$indexPath/centroids")
      val qCells = ivfAssignRouted(sample, idCol, vecCol, cent2, ck2)
        .withColumnRenamed("centroid_id", "_qc")
      val consistent = s.read.parquet(s"$indexPath/assignments")
        .join(qCells, idCol).filter(col("centroid_id") === col("_qc")).count()
      if (consistent != probes)
        throw new IllegalStateException(
          s"rebuildIndex: post-rebuild assignment consistency failed at " +
            s"$indexPath — $consistent of $probes sampled vectors sit in " +
            "their re-routed cell")
      val queries = sample.select((col(idCol) + shift).as("_rq_id"),
        col(vecCol).as("_rq_v"))
      val searchHits = ivfSearchIndexed(indexPath, corpus, idCol, vecCol,
          queries, "_rq_id", "_rq_v", nprobe = 2, k = 3)
        .filter(col("cand_id") === col("_rq_id") - shift).count()
      val floor = math.ceil(recallFloor * probes).toLong
      if (searchHits < floor)
        throw new IllegalStateException(
          s"rebuildIndex: search-path recall floor failed at $indexPath — " +
            s"$searchHits of $probes identical-embedding twins found at " +
            s"nprobe=2 (floor $floor, recallFloor=$recallFloor)")
      RebuildStats(n2, k2, sp2, ck2, probes, consistent, searchHits,
        rebuildSec, (System.nanoTime() - t1) / 1e9)
    }
  }

  /** Probe a persisted index: centroids + inverted-list assignment come
    * from [[writeIndex]] parquet; only the probe's own work (query→bucket
    * routing + in-bucket exact cosine) runs per call. */
  def ivfSearchIndexed(indexPath: String, v: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, qIdCol: String, qVecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val spark = v.sparkSession
    // torn-rebuild fence (ADVICE r19: probes against a stamp-published-
    // but-torn assignments dir used to run and return silently wrong
    // results; only absorbs were protected). One stamp read + one
    // existence check at frame-construction time — never per probe row.
    requireCommittedAssignments(spark, indexPath, readAnnMeta(indexPath))
    val centroids = spark.read.parquet(s"$indexPath/centroids")
    val assignments = spark.read.parquet(s"$indexPath/assignments")
    // SHUFFLE_HASH: the narrow assignment frame builds, the wide vector
    // side streams (unhinted = SMJ = external sort of the embeddings)
    searchAssigned(v.join(assignments.hint("shuffle_hash"), idCol),
      idCol, vecCol, centroids, queries, qIdCol, qVecCol, nprobe, k)
  }

  /** Shared probe stage: route each query to its `nprobe` nearest
    * centroids (broadcast, tiny), then exact cosine top-k inside the
    * probed buckets only. */
  /** Query→nprobe-centroid routing, shared by [[searchAssigned]] and the
    * `ivf_quant` composition (one definition so the two oracle-gated
    * consumers cannot drift): exact scaled-int cosine against the
    * broadcast centroid table, ties broken by centroid_id — bit-identical
    * to the oracle's `qprobe` CTE. Input must carry `qIdCol` plus `_q`
    * (vector) and `_qn` (scaled norm); output keeps the input columns and
    * adds `centroid_id` (one row per probed bucket). */
  def routeQueries(q: DataFrame, qIdCol: String, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val keep = q.columns.map(col).toSeq
    val scored = q.crossJoin(broadcast(centroids))
      .select(keep :+ col("centroid_id") :+
        cosine(dotScaled(col("_q"), col("centroid")),
          col("_qn"), normScaled(col("centroid"))).as("_cos"): _*)
    topKPerKey(scored, col(qIdCol), col("_cos"), col("centroid_id"), nprobe)
      .select(keep :+ col("centroid_id"): _*)
  }

  private def searchAssigned(vAssigned: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, qIdCol: String, qVecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val qBuckets = routeQueries(
      queries.select(col(qIdCol), col(qVecCol).as("_q"),
        normScaled(col(qVecCol)).as("_qn")),
      qIdCol, centroids, nprobe)
    val sims = vAssigned.join(broadcast(qBuckets), Seq("centroid_id"))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).as("cand_id"),
        cosine(dotScaled(col("_q"), col(vecCol)),
          col("_qn"), normScaled(col(vecCol))).as("cos_sim"))
    topKPerKey(sims, col(qIdCol), col("cos_sim"), col("cand_id"), k)
      .select(col(qIdCol), col("cand_id"), col("rank"), col("cos_sim"))
  }

  /** Random-hyperplane LSH bucketing (the brief's "LSH-bucketed variant"
    * of similarity search, next to IVF): each vector gets `planes` sign
    * bits — bit p = sign(Σ_d s(p,d)·v_d) with s(p,d) ∈ {±1} derived
    * DETERMINISTICALLY from the portable hash of (p, d) — grouped into
    * `bands` band keys (classic OR-amplification: near vectors agree on
    * at least one whole band with high probability). Returns one row per
    * (id, band) with the band's bucket key.
    *
    * Scale + determinism: the whole derivation is a per-ROW kernel
    * ([[graft.functions.RpLshKeys]] — every dimension of a vector sits
    * inside its own row, so the signature never needed an explode or an
    * aggregate): one codegen'd call per vector, zero exchanges, exact
    * integer ±round(x·1e7) sums, signs from the portable (plane, dim)
    * hash. The former relational derivation (posexplode dims →
    * broadcast sign join → (id, plane) grouped sum → band keys) is kept
    * as [[rpLshBandsExploded]] for the differential spec: at the r15
    * fourth decade its (id, plane) aggregate — 320 M in-flight groups
    * over 20 M vectors — was `rplsh_knn`'s dominant spiller, the same
    * near-unique-key partial-aggregation tax `minhash_sig`/`gram_set`
    * removed from the text family. Bit-identical output
    * (RpLshKernelSpec), so the DuckDB oracle CTEs are untouched. */
  def rpLshBands(v: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, bands: Int = 2): DataFrame = {
    require(planes % bands == 0, s"planes=$planes not divisible by bands=$bands")
    v.select(col(idCol),
        posexplode(call_function("rplsh_keys", col(vecCol), lit(planes), lit(bands)))
          .as(Seq("band", "band_key")))
  }

  /** The pre-r15 relational derivation of [[rpLshBands]], kept callable
    * for the kernel differential (RpLshKernelSpec pins bit-equality on
    * fixture embeddings plus null/empty/negative-half edge vectors). */
  private[graft] def rpLshBandsExploded(v: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, bands: Int = 2): DataFrame = {
    require(planes % bands == 0, s"planes=$planes not divisible by bands=$bands")
    val spark = v.sparkSession
    val planesDf = spark.range(0, planes).select(col("id").cast("int").as("plane"))
    val scaled = round(col("x").cast("double") * 1e7).cast("long")
    val exploded = v.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
    // the hyperplane sign depends only on (plane, dim): evaluate the hash
    // once per (plane, dim) in a tiny broadcast table (planes × dims rows),
    // not once per (vector, plane, dim) contribution
    val signTable = exploded.select(col("dim")).distinct()
      .crossJoin(planesDf)
      .select(col("plane"), col("dim"),
        (pmod(graft.queries.hash60(
          concat(lit("rp"), col("plane"), lit(":"), col("dim"))), lit(2L)) === 0).as("pos"))
    val contrib = exploded.join(broadcast(signTable), Seq("dim"))
      .select(col(idCol), col("plane"),
        when(col("pos"), scaled).otherwise(-scaled).as("sx"))
    val bits = contrib.groupBy(col(idCol), col("plane"))
      .agg((sum(col("sx")) > 0).as("bit"))
    val perBand = planes / bands
    bits.groupBy(col(idCol), (col("plane") / perBand).cast("int").as("band"))
      .agg(sum(when(col("bit"),
        pow(lit(2.0), pmod(col("plane"), lit(perBand))).cast("long"))
        .otherwise(0L)).as("band_key"))
  }

  // ------------------------------------------------------------------
  // int8 scalar quantization — the 100 TB byte-budget lever: a float32
  // embedding column quantized per-vector to array<tinyint> is 4× fewer
  // bytes on disk, in the scan, and across every shuffle/broadcast that
  // carries candidate vectors. Quantized similarity is approximate; the
  // production shape is quantized first pass → exact re-rank of the
  // shortlist (`quant_rerank`), with `quant_recall` auditing both.
  // ------------------------------------------------------------------

  /** Exact integer dot product (long) — the native codegen'd
    * [[graft.functions.IntDot]] (`int_dot`, registered by
    * [[graft.GraftExtensions]]). No rounding anywhere: products and sum
    * are exact 64-bit integers, trivially bit-identical to DuckDB's
    * `list_sum` twin. */
  def intDot(a: Column, b: Column): Column =
    call_function("int_dot", a, b)

  /** HOF twin of [[intDot]] (differential-test reference; interpreted
    * CodegenFallback, same semantics). */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Per-vector symmetric int8 quantization: `q_i = round(x_i · 127 /
    * max_j |x_j|)` as `array<tinyint>` (an all-zero vector quantizes to
    * zeros). Deterministic cross-engine: the max, the scale division and
    * the half-away-from-zero round are the same IEEE double ops in Spark
    * and DuckDB, so the quantized codes — and therefore every downstream
    * integer dot — are bit-identical to the oracle. Build-time only
    * (HOF lambdas are interpreted); probes read the persisted tinyint
    * codes and never re-quantize.
    *
    * Degenerate vectors (null, all-zero, or any non-finite component —
    * NaN/±Inf make the max non-finite) quantize to zeros instead of
    * crashing the codes build under ANSI's checked `cast(byte)`. The
    * oracle twin assumes finite embeddings (fixture-guarded); the
    * zeros fallback is Spark-side robustness for real corpora, where a
    * poisoned vector must not kill a 100 TB build. */
  def quantizeInt8(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    val degenerate = mx.isNull || mx === 0d || isnan(mx) ||
      mx === Double.PositiveInfinity
    when(degenerate, transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec,
        x => round(x.cast("double") * 127 / mx).cast("byte")))
  }

  /** Write a user-owned int8 codes table at `path`:
    * `(vec_id, q: array<tinyint>, qn2)` — the [[quantizeInt8]] form of
    * the corpus, searchable by [[intDot]] cosine. Sibling of
    * [[writeIndex]] for the quantized family. */
  def writeCodes(v: DataFrame, idCol: String, vecCol: String,
      path: String): Unit =
    v.select(col(idCol).as("vec_id"), quantizeInt8(col(vecCol)).as("q"))
      .withColumn("qn2", intDot(col("q"), col("q")))
      .write.mode("overwrite").parquet(path)

  /** Absorb new vectors into a user-owned codes table — the int8 analog
    * of [[absorbIndex]], and the simplest lifecycle of the three index
    * families: per-vector quantization has NO trained state (no
    * centroids or planes to go stale), so append IS the whole
    * maintenance story — an absorbed vector is immediately searchable
    * at exactly the fidelity a full rebuild would give it, and recall
    * never drifts with distribution. */
  def absorbCodes(codesPath: String, newV: DataFrame, idCol: String,
      vecCol: String): Unit =
    newV.select(col(idCol).as("vec_id"), quantizeInt8(col(vecCol)).as("q"))
      .withColumn("qn2", intDot(col("q"), col("q")))
      .write.mode("append").parquet(codesPath)

  /** Exact top-k rows per key, scale-safely: a partial top-k inside each
    * shuffle partition first (heap-sized window over (key, partition)),
    * THEN the global per-key window over the ≤ numPartitions·k survivors —
    * the classic salted top-k. A single window over `key` would funnel
    * every candidate row of a key through one reducer (billions of rows at
    * 100 TB); the partial pass bounds the final shuffle to k rows per
    * (key, partition). Emits `rank` 1..k by (orderCol DESC, tieCol ASC). */
  def topKPerKey(df: DataFrame, key: Column, orderCol: Column, tieCol: Column, k: Int): DataFrame = {
    val partial = Window.partitionBy(key, spark_partition_id())
      .orderBy(orderCol.desc, tieCol.asc)
    val fin = Window.partitionBy(key).orderBy(orderCol.desc, tieCol.asc)
    df.withColumn("_pr", row_number().over(partial)).filter(col("_pr") <= k).drop("_pr")
      .withColumn("rank", row_number().over(fin)).filter(col("rank") <= k)
  }

  /** [[topKPerKey]] as a BOUNDED-HEAP AGGREGATE ([[graft.functions
    * .TopKBy]]) — for the few-groups × huge-stream shape (brute-force
    * knn, exact recall ground truth, the int8 shortlist), where the
    * window form per-partition-SORTS the whole queries×corpus score
    * stream for ranks it immediately discards: 5.6–6.4 GB of spill per
    * recall audit at 20 M vectors (`r17m/` byte maps, VERDICT r17
    * missing #4). One k-slot buffer per (group, partition) replaces the
    * sort; only k rows per group cross the exchange; output is
    * bit-identical to the window form on null-free score streams
    * (VectorsSpec differential). Emits (keyCol, tieCol, rank, ordCol)
    * with rank 1..k by (ordCol DESC, tieCol ASC) — the window twin's
    * exact schema. Group count must stay far below the object-agg
    * fallback threshold (query sets, not corpora). */
  def topKPerKeyAgg(df: DataFrame, keyCol: String, ordCol: String,
      tieCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(call_function("top_k_by", col(tieCol), col(ordCol), lit(k)).as("_tk"))
      .select(col(keyCol), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(keyCol), col("_e.id").as(tieCol),
        (col("_pos") + 1).cast("int").as("rank"), col("_e.ord").as(ordCol))

  /** Default per-bucket row bound for exhaustive in-bucket pairing —
    * overridable per session via `spark.graft.neardup.maxBucketRows`.
    * 2^16 rows is ~2·10^9 pairs in one bucket: past it, exhaustive
    * verification is the wrong tool and the job should route through
    * ANN candidates (`knn_bucketed` / `quant_rerank`) instead. */
  val MaxBucketRows = 1 << 16

  def maxBucketRowsFor(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.getOption("spark.graft.neardup.maxBucketRows").map(_.toLong)
      .getOrElse(MaxBucketRows.toLong)

  /** Density guard for exhaustive in-bucket pair expansion (VERDICT r10
    * next-round #5): rows pass through unchanged, but any bucket holding
    * more than `maxRows` rows fails LOUDLY at execution — n rows expand
    * to n·(n−1)/2 pairs, so one pathological hot bucket (a degenerate
    * centroid, a constant label) silently turns a linear verifier
    * quadratic; the guard turns that into an error naming the bucket and
    * pointing at the ANN-candidate path, the same discipline as the
    * connected-components round budget.
    *
    * The check is IN the plan, not an eager driver-side count (the
    * VERDICT r07 rule: builders must not execute jobs per invocation —
    * bench reps and plan dumps would each pay it): one per-bucket
    * partial-agg count joined back on the bucket key, feeding a filter
    * whose predicate `raise_error`s on oversized buckets and passes
    * everything else — a filter is never pruned away, so the guard
    * cannot be optimized out, and it costs one narrow agg on a column
    * the pair join shuffles anyway. */
  def withBucketBound(v: DataFrame, bucketCol: String, maxRows: Long): DataFrame = {
    val counts = v.groupBy(col(bucketCol)).agg(count(lit(1)).as("_bucket_n"))
    v.join(counts, Seq(bucketCol))
      .filter(when(col("_bucket_n") > maxRows,
        raise_error(concat(
          lit(s"exhaustive in-bucket pairing: bucket $bucketCol="),
          col(bucketCol).cast("string"),
          lit(" holds "), col("_bucket_n").cast("string"),
          lit(s" rows (cap $maxRows) — ~"),
          (col("_bucket_n") * (col("_bucket_n") - 1) / 2).cast("long").cast("string"),
          lit(" pairs; raise spark.graft.neardup.maxBucketRows or route " +
            "this bucket through ANN candidates (knn_bucketed/quant_rerank)"))))
        .otherwise(lit(true)))
      .select(v.columns.map(col).toSeq: _*) // original order: the join led with its key
  }

  /** Candidate pairs from an LSH band-key SELF-join, with the tight-
    * cluster regime bounded STRUCTURALLY instead of guarded or exploded
    * (round-16: the sf10 `semdedup_ann` OOM). Input `keys` is the
    * persisted band-key table `(vec_id, band, band_key)`; output is
    * distinct `(vec_a, vec_b)` with `vec_a < vec_b`.
    *
    * The defect this replaces: key WIDTH sizes the EXPECTED bucket, but
    * a tight cluster (a clone family, a template burst — exactly what a
    * dedup corpus contains) is an irreducible bucket no width can
    * split: its members agree on every hyperplane sign, so all-pairs
    * within buckets is quadratic in cluster size at ANY geometry, and
    * the Hamming-1 probe multiplies the whole stream by (1+bits).
    * Measured on the round-16 jittered sf10 fixture (200 k vectors,
    * 12-bit keys, 100-clone families): 756 M candidate rows — ~3 800
    * per vector — OOMing a 8 GiB heap; the same shape at 20 M vectors
    * is ~10¹¹ rows (`r16m/` + PERF.md round-16).
    *
    * The bound, two regimes split at `cap` (= the geometry's own
    * per-bucket design target, [[AnnGeometry.DedupTargetBucketRows]]):
    *  - buckets ≤ cap — the geometry DID split these — keep exhaustive
    *    in-bucket pairing plus the Hamming-1 multi-probe against them
    *    (recall identical to the unbounded form; the verify-scale
    *    fixtures sit entirely in this regime: max bucket 51);
    *  - buckets > cap — tight clusters the geometry CANNOT split —
    *    pair every member with the bucket's min-id REPRESENTATIVE
    *    (SemDeDup's own compare-to-centroid semantics): linear in
    *    cluster size, and on a genuinely tight cluster the verdict set
    *    is exactly the exhaustive one (every member is near the rep,
    *    so all but the lowest id drop).
    * Every emitted pair still flows through the caller's verification
    * gate (same centroid + cosine threshold), so the certified-subset
    * property vs the exhaustive row is preserved in both regimes —
    * star pairs can MISS drops, never invent one. Measured effect at
    * sf10: 756 M → 6.5 M candidates (32/vector) at cap 64.
    *
    * Plan shape (round-17 rewrite — two more structural bounds):
    *  - FIRST-BAND emission instead of a terminal pair-keyed
    *    `distinct()`: a pair whose keys collide (within the mask set)
    *    in several bands used to be emitted once per band and deduped
    *    by one full exchange+sort of the candidate-pair multiset
    *    (~640 M rows at 20 M vectors — the same shape
    *    [[graft.functions.BucketIdPairs]] removed from the MinHash
    *    family in r12). Here each side of the probe join carries its
    *    aligned per-band (key, bucket-size, bucket-rep) profile — built
    *    by ONE hash aggregate with 3·bands primitive max-slots (the
    *    [[graft.functions.ArgMaxBy]] buffer-width rule: primitive
    *    slots hash-aggregate, collected structs do not) — and a pair
    *    is emitted only in the FIRST band whose emission condition
    *    holds, decided by an unrolled codegen'd predicate over the
    *    profiles. The emitted stream is distinct by construction, in
    *    BOTH regimes and across the probe/star split (the predicate
    *    replays the exact per-band emission rule, star term included),
    *    so the output is bit-identical to distinct-of-multiset
    *    (VectorsSpec differential vs [[bandPairsCappedDistinct]]).
    *  - REP-ONLY Hamming-1 probes (`repOnlyProbes = true`, keyed to
    *    [[AnnGeometry.repOnlyProbes]] by the caller): the nonzero-mask
    *    fan-out — bands·bits·n rows, ~5 GB scratch per million vectors
    *    at fourth-decade widths — is emitted only by each bucket's
    *    min-id representative (buckets/n of the corpus), cutting it
    *    ~[[AnnGeometry.DedupTargetBucketRows]]×. Mask-0 probes (the
    *    in-bucket exhaustive pairing) still flow for every member.
    *    ORIENTATION (round 18, ADVICE r17): by default a pair is
    *    emitted only when the PROBER is the smaller endpoint — so a
    *    cross-bucket pair whose only rep endpoint is the larger id is
    *    silently missed, a recall tax beyond the documented rep-probe
    *    miss. `repBothOrientations = true` accepts the reverse
    *    orientation too (normalized to (min, max); reverse allowed when
    *    the prober's own bucket is also ≤ cap, which keeps rep-only ⊆
    *    full-fanout, and suppressed when the forward row exists, so
    *    emission stays exactly-once per band). It is OFF by default
    *    because it is NOT free: each rep probe then emits against the
    *    smaller-id members of its target bucket as well — at avg-38-row
    *    fourth-decade buckets that ~doubles the Hamming channel's
    *    candidate volume and its verify cost for a ~doubled Hamming hit
    *    rate (measured: `semdedup_ann` sf1000 75.0 s → 144.1 s,
    *    `r17m/sf1000_semdedup_ann_pva` vs `r18m/sf1000_ann_topk`, the
    *    latter at a FASTER calib). Same cost-per-discovered-pair;
    *    callers who want the recall buy it explicitly.
    *    Certified-subset preserved in both modes: a rep probe can miss
    *    a pair, never invent one — and an in-bucket neighbor of a
    *    missed member still reaches it through mask 0.
    * One narrow hash aggregate for bucket stats (count + min,
    * partial-combinable, no sort) SHUFFLE_HASH-joined back on the band
    * key, one profile aggregate on vec_id, and the probe join's
    * per-key match group stays ≤ cap rows by construction. Input
    * contract: one row per (vec_id, band), `band` ∈ [0, bands). */
  def bandPairsCapped(keys: DataFrame, masks: Seq[Long], cap: Long,
      repOnlyProbes: Boolean = false,
      bands: Int = AnnGeometry.Bands,
      repBothOrientations: Boolean = false): DataFrame = {
    // both-orientation emission is a rep-only refinement; in the full
    // regime every member probes, so the reverse rows are pure
    // duplicates and the flag is ignored
    val bothOrient = repOnlyProbes && repBothOrientations
    val stats = keys.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("_n"), min(col("vec_id")).as("_rep"))
    val keyed = keys.join(stats.hint("shuffle_hash"), Seq("band", "band_key"))
    // per-vector band profile: band-aligned (key, bucket-n, bucket-rep)
    // arrays from 3·bands PRIMITIVE max-slots (each (vec, band) is one
    // row, so max(when(band=j, ·)) is just selection — and primitive
    // buffers keep this a HashAggregate at any corpus size)
    val slots = (0 until bands).flatMap { j =>
      Seq(max(when(col("band") === j, col("band_key"))).as(s"_k$j"),
        max(when(col("band") === j, col("_n"))).as(s"_n$j"),
        max(when(col("band") === j, col("_rep"))).as(s"_r$j"))
    }
    // repartition BEFORE the aggregate: `keyed` arrives partitioned on
    // (band, band_key) from the stats join, so a map-side partial agg
    // there holds ~every vec_id in the partition — the near-unique-key
    // partial-aggregation tax, measured at 10-13 GB spill PER pruned
    // variant of this subtree at 20 M vectors (r17m/
    // sf1000_semdedup_ann_aqeshj/explain_exec.txt). Exchanging the
    // narrow (vec_id, band, key, n, rep) rows first puts the partial
    // agg on complete partition-local groups (n/parts entries, no
    // spill) and the aggregate's own ENSURE_REQUIREMENTS exchange
    // disappears — same exchange count, narrower payload, zero sort.
    val perVec = keyed.repartition(col("vec_id")).groupBy(col("vec_id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("vec_id"),
        array((0 until bands).map(j => col(s"_k$j")): _*).as("_ks"),
        array((0 until bands).map(j => col(s"_n$j")): _*).as("_ns"),
        array((0 until bands).map(j => col(s"_r$j")): _*).as("_rs"))
    def at(a: String): Column = element_at(col(a), col("band") + 1)
    // A side: every member probes its own bucket (mask 0); Hamming-1
    // probes from every member (full regime) or bucket reps only. The
    // profile rides along — _na (own bucket sizes) ONLY under
    // both-orientation emission, which is the one consumer of it (the
    // extra array is ~3.4 GB of probe-stream shuffle at 20 M vectors —
    // not carried when nothing reads it).
    val aProfCols = Seq(col("_ks").as("_ka"), col("_rs").as("_ra")) ++
      (if (bothOrient) Seq(col("_ns").as("_na")) else Nil)
    val aCols = Seq(col("vec_a"), col("_ka"), col("_ra")) ++
      (if (bothOrient) Seq(col("_na")) else Nil)
    val aBase = perVec.select(col("vec_id").as("vec_a") +: aProfCols :+
        posexplode(col("_ks")).as(Seq("band", "_key")): _*)
      .filter(col("_key").isNotNull)
    val nonzero = masks.filter(_ != 0L)
    def withMasks(df: DataFrame, ms: Seq[Long]): DataFrame =
      df.select(col("band") +: col("_key") +: aCols :+
          explode(array(ms.map(lit(_)): _*)).as("_mask"): _*)
        .select(col("band") +:
          col("_key").bitwiseXOR(col("_mask")).as("band_key") +: aCols: _*)
    val aKeys =
      if (!repOnlyProbes || nonzero.isEmpty) withMasks(aBase, masks)
      else {
        val m0 =
          if (!masks.contains(0L)) None
          else Some(aBase.select(
            col("band") +: col("_key").as("band_key") +: aCols: _*))
        val mh = withMasks(
          aBase.filter(element_at(col("_ra"), col("band") + 1) === col("vec_a")),
          nonzero)
        m0.fold(mh)(_.union(mh))
      }
    // B side: small-bucket members are probe targets; over-cap buckets
    // star every member to the min-id representative
    val bRows = perVec.select(col("vec_id").as("vec_b"),
        col("_ks").as("_kb"), col("_ns").as("_nb"), col("_rs").as("_rb"),
        posexplode(col("_ks")).as(Seq("band", "band_key")))
      .filter(col("band_key").isNotNull)
    // the per-band emission rule, replayed over the profiles at an
    // EARLIER band j — true iff the pair would already have been
    // emitted there (so the current band must stay silent). Written
    // over the ORIENTATION-NORMALIZED pair (u = smaller id, v = larger):
    // since the rep-only regime accepts both probe orientations (below),
    // a row's A side may be either endpoint, so the replay reads each
    // profile through a which-side CASE. Null-safe: an absent band
    // (null key) collides with nothing.
    def emittedAt(j: Int): Column =
      if (!bothOrient) {
        // single-orientation regimes: every row's A side IS the smaller
        // endpoint (probed rows by the a<b filter; star rows because a
        // bucket's min-id rep precedes every member), so the replay
        // reads the profiles directly
        val xa = element_at(col("_ka"), j + 1)
          .bitwiseXOR(element_at(col("_kb"), j + 1))
        val smallB = element_at(col("_nb"), j + 1) <= cap
        val hammingGate =
          if (repOnlyProbes) element_at(col("_ra"), j + 1) === col("vec_a")
          else lit(true)
        coalesce(
          (smallB && xa.isin(masks: _*) && (xa === 0 || hammingGate)) ||
            (xa === 0 && !smallB &&
              element_at(col("_rb"), j + 1) === col("vec_a")),
          lit(false))
      } else {
        // both-orientation regime: a row's A side may be either
        // endpoint, so the replay reads each profile through a
        // which-side CASE over the normalized (u = min, v = max) pair
        val aIsU = col("vec_a") < col("vec_b")
        def fromU(a: String, b: String): Column =
          when(aIsU, element_at(col(a), j + 1)).otherwise(element_at(col(b), j + 1))
        def fromV(a: String, b: String): Column =
          when(aIsU, element_at(col(b), j + 1)).otherwise(element_at(col(a), j + 1))
        val xu = fromU("_ka", "_kb").bitwiseXOR(fromV("_ka", "_kb"))
        val nU = fromU("_na", "_nb")
        val nV = fromV("_na", "_nb")
        val repU = fromU("_ra", "_rb") === least(col("vec_a"), col("vec_b"))
        val repV = fromV("_ra", "_rb") === greatest(col("vec_a"), col("vec_b"))
        // mirror the emission rule EXACTLY (ADVICE r18): forward
        // emission (rep u probing v's small bucket) has no cap on u's
        // OWN bucket — only the reverse orientation requires the
        // prober's bucket small (nV is the reverse prober's own bucket
        // via the orient clause; nU is its small-side target). An
        // unconditional nU <= cap here failed to recognize a pair first
        // emitted by a rep of an over-cap bucket, so a later-band
        // collision re-emitted it (VectorsSpec pins the repro)
        val hamming = xu =!= 0 && xu.isin(nonzero: _*) &&
          nV <= cap && (repU || (repV && nU <= cap))
        // the mask-0 probed channel only EXISTS when 0 ∈ masks (the
        // aKeys m0 branch is guarded on it), so its replay must be too
        // (r19 review — the single-orientation branch gets this via
        // xa.isin(masks)); the star channel is mask-independent
        val probedM0 =
          if (masks.contains(0L)) xu === 0 && nV <= cap else lit(false)
        coalesce(
          probedM0 || hamming || (xu === 0 && nV > cap && repU),
          lit(false))
      }
    val firstBand = (0 until bands - 1)
      .map(j => !(col("band") > j && emittedAt(j)))
      .reduceOption(_ && _).getOrElse(lit(true))
    // Emission orientation. Full regime: the prober must be the smaller
    // id (every member probes, so each pair has its smaller-endpoint
    // row). Rep-only regime (round 18, ADVICE r17): Hamming-1 probes
    // exist only for bucket REPS, so smaller-endpoint-only silently
    // dropped every cross-bucket pair whose only rep endpoint is the
    // LARGER id — an extra recall tax at zero probe-row savings (the
    // rep's probe row already existed; only the match was discarded).
    // Accept the reverse orientation too: a rep prober p may emit
    // against a smaller target t when p's own bucket is also small
    // (keeps rep-only ⊆ full — the full regime never emits a pair whose
    // larger endpoint sits in an over-cap bucket) and t is NOT its own
    // bucket's rep at this band (if it were, the forward row emits —
    // exactly-once per band stays by construction). Self-bucket (mask-0)
    // rows keep the symmetric smaller-endpoint rule.
    val isSelf = at("_ka") === col("band_key")
    val orient =
      if (!bothOrient) col("vec_a") < col("vec_b")
      else (col("vec_a") < col("vec_b")) ||
        (!isSelf && col("vec_a") > col("vec_b") &&
          at("_na") <= cap && !(at("_rb") === col("vec_b")))
    val probed = aKeys
      .join(bRows.filter(at("_nb") <= cap), Seq("band", "band_key"))
      .filter(orient)
      .filter(firstBand)
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
    // SHUFFLE_HASH on the profile side: the star stream (over-cap
    // members × bands, carrying the b-side arrays) is the WIDE side —
    // unhinted this SMJ per-partition-sorts it (measured: 4.1 GB of the
    // sf300 run's 8.2 GB spill, r17m/sf300_semdedup_ann/explain_exec
    // .txt), while the profile side is one bounded ~100 B row per
    // vector (~16 MB/partition at the fourth decade's 128 parts).
    val star = bRows.filter(at("_nb") > cap && col("vec_b") =!= at("_rb"))
      .select(at("_rb").as("vec_a"), col("vec_b"), col("band"),
        col("_kb"), col("_nb"), col("_rb"))
      .join(perVec.select(col("vec_id").as("vec_a") +: aProfCols: _*)
        .hint("shuffle_hash"), Seq("vec_a"))
      .filter(firstBand)
      .select(col("vec_a"), col("vec_b"))
    probed.union(star)
  }

  /** The pre-r17 form of [[bandPairsCapped]] — every band emits, one
    * pair-keyed `distinct()` dedups the cross-band multiset. Kept
    * callable as the differential-test reference (VectorsSpec pins
    * set-bit-identity in BOTH probe regimes), like
    * [[rpLshBandsExploded]] for the key kernel. `repOnlyProbes` mirrors
    * the production rule in plain set semantics: nonzero-mask probes
    * come from bucket reps only, and a probe row may emit in either
    * orientation (normalized via least/greatest) when the prober's own
    * bucket is also small — duplicates are the `distinct()`'s job here,
    * where the first-band form must be exactly-once by construction. */
  private[graft] def bandPairsCappedDistinct(keys: DataFrame, masks: Seq[Long],
      cap: Long, repOnlyProbes: Boolean = false,
      repBothOrientations: Boolean = false): DataFrame = {
    val stats = keys.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("_n"), min(col("vec_id")).as("_rep"))
    val keyed = keys.join(stats.hint("shuffle_hash"), Seq("band", "band_key"))
    val small = keyed.filter(col("_n") <= cap)
      .select(col("band"), col("band_key"), col("vec_id").as("vec_b"))
    val star = keyed.filter(col("_n") > cap && col("vec_id") =!= col("_rep"))
      .select(col("_rep").as("vec_a"), col("vec_id").as("vec_b"))
    val nonzero = masks.filter(_ != 0L)
    val aSrc =
      if (!repOnlyProbes || nonzero.isEmpty)
        keyed.select(col("band"), col("band_key"), col("vec_id").as("vec_a"),
          col("_n").as("_n_own"), explode(array(masks.map(lit(_)): _*)).as("mask"))
      else {
        val m0 = keyed.select(col("band"), col("band_key"),
          col("vec_id").as("vec_a"), col("_n").as("_n_own"),
          lit(0L).as("mask")).filter(lit(masks.contains(0L)))
        val mh = keyed.filter(col("vec_id") === col("_rep"))
          .select(col("band"), col("band_key"), col("vec_id").as("vec_a"),
            col("_n").as("_n_own"),
            explode(array(nonzero.map(lit(_)): _*)).as("mask"))
        m0.union(mh)
      }
    val aKeys = aSrc.select(col("band"),
      col("band_key").bitwiseXOR(col("mask")).as("band_key"),
      col("vec_a"), col("_n_own"), col("mask"))
    val orient =
      if (!repOnlyProbes || nonzero.isEmpty || !repBothOrientations)
        col("vec_a") < col("vec_b")
      else (col("vec_a") < col("vec_b")) ||
        (col("mask") =!= 0 && col("vec_a") > col("vec_b") && col("_n_own") <= cap)
    val probed = aKeys.join(small, Seq("band", "band_key"))
      .filter(col("vec_a") =!= col("vec_b")).filter(orient)
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
    probed.union(star).distinct()
  }
}
