package graft

import java.nio.file.Files
import graft.sources.DedupIndex

/** The user-owned dedup-index lifecycle — the daily production flow:
  * create from the initial corpus, gate each arriving batch, absorb the
  * kept docs, and stay bucketed (exchange-free on the index side)
  * through it all. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the fence and the birds sing in the morning light of spring"

  test("lifecycle: create → dedupBatch → absorb → redelivered batch fully drops") {
    val dir = Files.createTempDirectory("graft_idx").toString + "/idx"
    val corpus = Seq(
      (1L, base),
      (2L, "completely different content about bucketed join layouts in spark")
    ).toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)

    // 10 = exact dup of 1; 11 = near dup of 1 (one appended word:
    // shingle Jaccard ≈ 0.96 → band collision + signature agreement);
    // 12 = genuinely new
    val batch = Seq(
      (10L, base),
      (11L, base + " indeed"),
      (12L, "a wholly novel document sharing no phrasing with the corpus at all")
    ).toDF("doc_id", "text")
    val kept = DedupIndex.dedupBatch(spark, idx, batch)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(12L),
      "exact dup and verified near dup must drop; the novel doc must survive")
    // all batch columns ride through the gates
    assert(kept.columns.toSeq == Seq("doc_id", "text"))

    // absorb the kept docs, then redeliver the same batch: 12 is now an
    // exact dup of itself → everything drops (idempotent redelivery)
    DedupIndex.absorb(spark, idx, kept)
    assert(DedupIndex.dedupBatch(spark, idx, batch).isEmpty,
      "redelivered batch must fully drop after absorb")

    // the probe stays exchange-free on the index side AFTER absorb: the
    // appended files landed inside the bucket layout
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = DedupIndex.dedupBatch(spark, idx, batch)
        .queryExecution.executedPlan
      val p = plan.toString
      assert(!p.contains("BroadcastExchange"))
      assert("SelectedBucketsCount: 4 out of 4".r.findAllIn(p).length == 2,
        s"both index scans must stay bucketed after absorb:\n$p")
      // and neither index scan sits under an exchange of its own (only
      // the batch side shuffles into the bucket layout)
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def scansIndexDirectly(n: org.apache.spark.sql.execution.SparkPlan): Boolean =
        n match {
          case sc: FileSourceScanExec =>
            sc.relation.location.rootPaths.exists(_.toString.contains("graft_idx"))
          case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
          case other => other.children.exists(scansIndexDirectly)
        }
      assert(!plan.collect { case e: ShuffleExchangeExec => e }
        .exists(e => scansIndexDirectly(e.child)),
        s"index side is reshuffled before its join:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }

    // a "new session" (tables dropped) reopens the same files by path —
    // the bucket count comes from the index's own metadata, and a WRONG
    // caller-supplied count is refused (it would silently mis-bucket
    // the join and drop matches)
    spark.sql(s"DROP TABLE ${idx.hashes}")
    spark.sql(s"DROP TABLE ${idx.bands}")
    intercept[IllegalArgumentException] { DedupIndex.open(spark, dir, buckets = 16) }
    val reopened = DedupIndex.open(spark, dir) // count from metadata
    assert(reopened.buckets == 4)
    assert(DedupIndex.dedupBatch(spark, reopened, batch).isEmpty)

    // compaction: a duplicate absorb appends duplicate hash rows; compact
    // publishes a re-distincted NEW version (same bucket layout, same
    // semantics) and returns the handle on it. The superseded version
    // stays on disk untouched — a reader mid-scan keeps its snapshot —
    // until vacuum reclaims it.
    // (An explicit frame, not `kept` — the lazy dedupBatch result
    // re-evaluates against the updated index; see the absorb scaladoc.)
    DedupIndex.absorb(spark, reopened, batch.filter($"doc_id" === 12L))
    val dupN = spark.table(reopened.hashes).count()
    val distinctN = spark.table(reopened.hashes).distinct().count()
    assert(dupN > distinctN,
      "fixture lost its point: re-absorb should duplicate hash rows")
    val compacted = DedupIndex.compact(spark, reopened)
    assert(compacted.versionDir != reopened.versionDir,
      "compact must publish a new version, not mutate the old in place")
    assert(spark.table(compacted.hashes).count() == distinctN)
    // the OLD handle still reads its complete (duplicated) snapshot:
    // nothing was renamed or deleted under it
    assert(spark.table(reopened.hashes).count() == dupN,
      "superseded version was disturbed — mid-scan readers would break")
    assert(DedupIndex.dedupBatch(spark, compacted, batch).isEmpty)
    val prevT2 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = DedupIndex.dedupBatch(spark, compacted, batch)
        .queryExecution.executedPlan.toString
      assert("SelectedBucketsCount: 4 out of 4".r.findAllIn(p).length == 2,
        s"compaction lost the bucket layout:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT2)
    // vacuum (after the quiescent period) keeps only the newest version
    val fs = graft.sources.ArtifactStore.fs(dir)
    assert(graft.sources.ArtifactStore.versions(fs, dir).length == 2)
    graft.sources.ArtifactStore.vacuum(fs, dir, keep = 1, staleMs = 0L)
    val left = graft.sources.ArtifactStore.versions(fs, dir)
    assert(left.length == 1 && left.head._3.toString == compacted.versionDir)
  }

  test("dedupBatch differential: equals the inline two-gate computation on a random corpus") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def text() = Seq.fill(15 + rnd.nextInt(15))(words(rnd.nextInt(words.size))).mkString(" ")
    val corpusRows = (0 until 40).map(i => (i.toLong, text()))
    val corpus = corpusRows.toDF("doc_id", "text")
    // batch: 10 exact copies, 10 near variants (one appended word),
    // 10 fresh — planted against random base text, gate outcomes are
    // whatever the real signatures say; the point is EQUALITY of paths
    val batchRows =
      (0 until 10).map(i => (100L + i, corpusRows(i)._2)) ++
      (0 until 10).map(i => (200L + i, corpusRows(10 + i)._2 + " omega")) ++
      (0 until 10).map(i => (300L + i, text()))
    val batch = batchRows.toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft_idx_diff").toString + "/idx"
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    val kept = DedupIndex.dedupBatch(spark, idx, batch)
      .select("doc_id").as[Long].collect().toSet

    val cH = corpus.select(sha2($"text", 256).as("_h")).distinct()
    val exact = batch.withColumn("_h", sha2($"text", 256)).join(cH, Seq("_h"), "left_anti")
    val cB = TextOps.bandTableFromSignatures(
        TextOps.minhashSignatures(corpus, "doc_id", "text"), "doc_id", keepSig = true)
      .select($"band", $"band_key", $"sig".as("_cs"))
    val near = TextOps.bandTableFromSignatures(
        TextOps.minhashSignatures(batch, "doc_id", "text"), "doc_id", keepSig = true)
      .join(cB, Seq("band", "band_key"))
      .filter(TextOps.sigAgreement($"sig", $"_cs") >= TextOps.verifyMinEqual)
      .select("doc_id").distinct()
    val naive = exact.join(near, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet

    assert(kept == naive, s"index path diverged from inline path: " +
      s"onlyIndex=${kept -- naive} onlyInline=${naive -- kept}")
    // sanity on the planted structure: every exact copy dropped, every
    // fresh doc's fate decided by real (not vacuous) gates
    assert((100L until 110L).forall(!kept.contains(_)))
  }

  test("bloom gate geometry rides metadata: constructing the gate runs ZERO jobs") {
    import graft.sources.{DedupIndex, HashBloom}
    val corpus = Seq(
      (1L, base),
      (2L, "geometry metadata fixture corpus document two")
    ).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, "a new document for the geometry gate"))
      .toDF("doc_id", "text")
    // build everything that legitimately runs jobs BEFORE the listener
    val dir = Files.createTempDirectory("graft_idx_geom").toString + "/idx"
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    DedupIndex.absorbBloom(spark, idx, corpus) // sidecar exists + has metadata
    val cH = spark.table(idx.hashes)
    val cB = spark.table(idx.bands)
    val bloom = DedupIndex.ensureBloom(spark, idx)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (buckets, width) =
      try {
        // geometry lookup = one metadata file read, no Spark job
        val g = DedupIndex.sidecarGeometry(spark, idx)
        // gate CONSTRUCTION (incl. planning) must run no job either —
        // the old form paid a count() of the sidecar per call, which
        // bench reps and plan dumps each re-paid
        val gated = DedupIndex.dedupBatchBloom(batch, cH, cB, bloom,
          bloomBuckets = g._1)
        gated.queryExecution.executedPlan
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        g
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0,
      s"gate construction ran ${jobs.get()} jobs — geometry probes are back")
    assert(buckets == DedupIndex.BloomBuckets && width > 0)
    // the metadata agrees with the frame-derived truth
    assert(buckets == HashBloom.bucketsOf(bloom) && width == HashBloom.widthOf(bloom))
    // and the gate still gates: corpus redelivery drops, fresh survives
    val kept = DedupIndex.dedupBatchBloom(batch, cH, cB, bloom, bloomBuckets = buckets)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L))
  }

  test("racing bloom absorbs: BOTH batches' hashes survive the winning lineage") {
    import graft.sources.{ArtifactStore, HashBloom}
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_idx_race").toString + "/idx"
    val corpus = Seq(
      (1L, base),
      (2L, "entirely different corpus text about artifact commit claims")
    ).toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)

    // two maintenance writers race their sidecar grows: without the
    // claim protocol each would OR its batch into the same parent and
    // the deterministic winner would silently drop the loser's bits —
    // the false negatives a Bloom gate must never have
    val batchA = (0 until 50).map(i => (100L + i, s"racer A document $i"))
      .toDF("doc_id", "text")
    val batchB = (0 until 50).map(i => (200L + i, s"racer B document $i"))
      .toDF("doc_id", "text")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq(batchA, batchB).map { b =>
      new Thread(() => {
        try { barrier.await(); DedupIndex.absorbBloom(spark, idx, b) }
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"racer failed: ${errors.peek()}")

    // the current sidecar must contain EVERY hash either racer absorbed
    // (plus the corpus), with zero false negatives
    val bloom = DedupIndex.ensureBloom(spark, idx)
    val all = corpus.unionByName(batchA).unionByName(batchB)
      .select(sha2($"text", 256).as("h"))
    val fn = HashBloom.withMaybe(all, bloom, "h",
      HashBloom.bucketsOf(bloom)).filter(!col("_maybe")).count()
    assert(fn == 0L, s"$fn hashes lost to the race — loser's commit superseded")
    // both grows committed as versions (bootstrap may add one more) and
    // no claim is left behind
    val f = ArtifactStore.fs(dir)
    assert(ArtifactStore.versions(f, s"$dir/_bloom").length >= 2)
    assert(!ArtifactStore.activeClaim(f, s"$dir/_bloom"))
  }

  test("absorb racing a compaction: the fence re-drives the batch into the successor") {
    import graft.sources.ArtifactStore
    import org.apache.hadoop.fs.{FileUtil, Path}
    val dir = Files.createTempDirectory("graft_idx_fence").toString + "/idx"
    val corpus = Seq(
      (1L, base),
      (2L, "unrelated corpus content for the compaction fence fixture")
    ).toDF("doc_id", "text")
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    val f = ArtifactStore.fs(dir)
    val conf = ArtifactStore.hadoopConf()
    val v1 = new Path(idx.versionDir)

    // a compactor snapshots v1's files BEFORE the absorb lands its rows —
    // the lost-append hazard: its successor version won't contain them
    val snap = new Path(Files.createTempDirectory("graft_idx_snap").toString, "snap")
    FileUtil.copy(f, v1, f, snap, false, conf)

    // the compactor holds its commit claim while the absorb runs; the
    // absorber's fence (awaitUnclaimed + version re-check) must hold it
    // at the door until the compactor publishes, then re-drive
    val fs2 = f
    val claim = new Path(dir, "_graft_claim_0000000002")
    val out = fs2.create(claim, false)
    out.write("compactor".getBytes("UTF-8")); out.close()

    val batch = Seq((10L, "a fresh document the compactor snapshot never saw"))
      .toDF("doc_id", "text")
    val result = new java.util.concurrent.atomic.AtomicReference[DedupIndex.Index]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t = new Thread(() => {
      try result.set(DedupIndex.absorb(spark, idx, batch))
      catch { case e: Throwable => errors.add(e) }
    })
    t.start()
    Thread.sleep(1000) // let the appends land in v1 while the claim holds
    // compactor publishes its (batch-less) snapshot as v2, then releases
    val v2 = new Path(dir, "v0000000002_500_compactor")
    FileUtil.copy(f, snap, f, v2, false, conf)
    f.create(new Path(v2, ArtifactStore.Marker), true).close()
    f.delete(claim, false)
    t.join(120000)
    assert(errors.isEmpty, s"absorb failed: ${errors.peek()}")

    // the returned handle is on the successor, and the batch's rows are
    // IN it: a redelivery fully drops — nothing was silently superseded
    val newIdx = result.get()
    assert(newIdx != null && newIdx.versionDir == f.makeQualified(v2).toString,
      s"absorb must re-drive into the successor, got ${Option(newIdx).map(_.versionDir)}")
    assert(DedupIndex.dedupBatch(spark, newIdx, batch).isEmpty,
      "re-driven batch rows missing from the successor — the compaction ate them")
    // and the corpus the snapshot carried still gates
    assert(DedupIndex.dedupBatch(spark, newIdx,
      corpus.withColumn("doc_id", $"doc_id" + 100L)).isEmpty)
  }

  test("HashBloom: no false negatives, bounded false-positive rate, bloom gate == exact gate") {
    import graft.sources.HashBloom
    import org.apache.spark.sql.functions._
    val members = (0 until 2000).map(i => s"member-doc-$i").toDF("h")
    val bloom = HashBloom.build(members, "h", buckets = 8)
    assert(bloom.count() <= 8)

    // EVERY member must probe maybe=true — a single false negative means
    // silently landing a duplicate, the failure mode the gate must never have
    val fn = HashBloom.withMaybe(members, bloom, "h", 8)
      .filter(!col("_maybe")).count()
    assert(fn == 0L, s"$fn false negatives")

    // fresh keys: the ~1% design fpp, asserted with slack
    val fresh = (0 until 2000).map(i => s"fresh-doc-$i").toDF("h")
    val fp = HashBloom.withMaybe(fresh, bloom, "h", 8)
      .filter(col("_maybe")).count()
    assert(fp.toDouble / 2000 < 0.05, s"fpp ${fp / 2000.0} above bound")
    // a healthy ~1% filter MUST collide on some of 2000 fresh keys —
    // fp == 0 means the probe path is broken (e.g. tests reduced to
    // constant false), which is exactly what this guard exists to catch
    assert(fp > 0L, "zero false positives across 2000 fresh keys — vacuous probe?")

    // end to end: the bloom-gated dedup returns exactly the exact-path
    // rows on a corpus/batch with planted duplicates
    val corpus = (0 until 40).map(i => (i.toLong,
      s"corpus document number $i with enough words to shingle " +
        "reliably across the minhash window")).toDF("doc_id", "text")
    val batch = ((0 until 10).map(i => (100L + i,
      s"corpus document number $i with enough words to shingle " +
        "reliably across the minhash window")) ++
      (0 until 10).map(i => (300L + i,
        s"wholly fresh batch document $i sharing no phrasing at all " +
          "with anything the corpus has ever landed"))).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_idx_bloom").toString + "/idx"
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    val cH = spark.table(idx.hashes)
    val cB = spark.table(idx.bands)
    val cBloom = HashBloom.build(cH, "h", DedupIndex.BloomBuckets)
    val viaBloom = DedupIndex.dedupBatchBloom(batch, cH, cB, cBloom)
      .select("doc_id").as[Long].collect().toSet
    val viaExact = DedupIndex.dedupBatch(batch, cH, cB)
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom == viaExact,
      s"onlyBloom=${viaBloom -- viaExact} onlyExact=${viaExact -- viaBloom}")
    assert((100L until 110L).forall(!viaBloom.contains(_)),
      "planted exact duplicates must drop through the bloom path")
    assert((300L until 310L).forall(viaBloom.contains),
      "fresh docs must survive the bloom path")

    // the gate's VALUE claim, measured on the real fixture: most of a
    // mostly-fresh batch must skip the exact probe (_maybe = false)
    val fixtureBatch = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" >= 400L).withColumn("_h", sha2($"text", 256))
    val fixtureBloom = HashBloom.build(
      graft.sources.DedupIndex.corpusHashes(spark, "/root/testdata/sf0.001", 400L),
      "h", DedupIndex.BloomBuckets)
    val probed = HashBloom.withMaybe(fixtureBatch, fixtureBloom, "_h",
      DedupIndex.BloomBuckets)
    val nBatch = probed.count()
    val nSkip = probed.filter(!col("_maybe")).count()
    assert(nSkip.toDouble / nBatch > 0.5,
      s"only $nSkip of $nBatch batch rows skip the probe — gate adds cost, not value")

    // --- the staleness trap, demonstrated and fixed ------------------
    // a filter built before the set grew says "provably absent" for the
    // new members (a Bloom cannot un-say absent) — against an evolving
    // hash set, a stale sidecar manufactures exactly the false
    // negatives the gate must never have. (In the COMPOSED dedupBatch
    // the fresh band table happens to re-catch identical-text
    // redeliveries — the whole-text shingle fallback makes exact dupes
    // a subset of near dupes — but the exact gate must stay sound on
    // its own, not lean on an independent mechanism.)
    val absorbed = Seq("absorbed-hash-1", "absorbed-hash-2").toDF("h")
    val staleMiss = HashBloom.withMaybe(absorbed, bloom, "h", 8)
      .filter(!col("_maybe")).count()
    assert(staleMiss > 0,
      "fixture lost its point: the stale sidecar should miss new members")
    // lockstep maintenance: OR the new hashes in, same geometry → the
    // grown set probes clean again, old members included
    val grown = HashBloom.add(bloom, absorbed, "h", 8)
    assert(HashBloom.widthOf(grown) == HashBloom.widthOf(bloom),
      "add must preserve the filter geometry")
    assert(HashBloom.withMaybe(members.unionByName(absorbed), grown, "h", 8)
      .filter(!col("_maybe")).isEmpty,
      "lockstep-maintained filter must have no false negatives")
  }

  test("absorb staleness gate: fires past 2x the create-time corpus, survives compaction; override escapes") {
    def docs(r: Range) = r.map(i =>
      (i.toLong, s"wholly distinct document number $i about topic ${i * 31}"))
      .toDF("doc_id", "text")
    // under the absolute floor (2^16 rows) a toy index absorbs unchecked
    // at ANY ratio — the Maintain/streaming lifecycle specs rely on it
    val dir0 = Files.createTempDirectory("graft_idx_floor").toString + "/idx"
    val idx0 = DedupIndex.create(spark, docs(0 until 4), dir0, buckets = 4)
    DedupIndex.absorb(spark, idx0, docs(100 until 120))
    // the ratio gate itself, pinned by zeroing the floor on a FRESH index
    val dir = Files.createTempDirectory("graft_idx_stale").toString + "/idx"
    val idx = DedupIndex.create(spark, docs(0 until 4), dir, buckets = 4)
    spark.conf.set("spark.graft.absorb.staleFloorRows", "0")
    try {
      // 7 of a 2x8 budget: absorb-as-maintenance must not warn
      DedupIndex.absorb(spark, idx, docs(10 until 13))
      // 9 > 8: the layout is past its design point — refuse, naming it
      val e = intercept[IllegalStateException] {
        DedupIndex.absorb(spark, idx, docs(20 until 22))
      }
      assert(e.getMessage.contains("design point") &&
        e.getMessage.contains("created for 4"))
      // explicit override keeps appending into the frozen layout
      spark.conf.set("spark.graft.absorb.allowStale", "true")
      val idx2 =
        try DedupIndex.absorb(spark, idx, docs(20 until 22))
        finally spark.conf.unset("spark.graft.absorb.allowStale")
      // compaction re-distincts but does NOT re-size: the design point
      // rides through and the gate still refuses afterwards
      val compacted = DedupIndex.compact(spark, idx2)
      val e2 = intercept[IllegalStateException] {
        DedupIndex.absorb(spark, compacted, docs(30 until 32))
      }
      assert(e2.getMessage.contains("created for 4"))
    } finally spark.conf.unset("spark.graft.absorb.staleFloorRows")
  }

  test("pruned exact gate: equals the plain gate; the probe opens only maybe partitions") {
    import graft.sources.HashBloom
    import org.apache.spark.sql.functions._
    val parts = 64
    // corpus layout: 3000 content hashes hive-partitioned on hb
    val corpusTexts = (0 until 3000).map(i => s"landed corpus document body $i")
    val corpusH = corpusTexts.toDF("text").select(sha2($"text", 256).as("h"))
    val dir = Files.createTempDirectory("graft_pruned_spec").toString
    corpusH.withColumn("hb", pmod(xxhash64($"h"), lit(parts.toLong)).cast("int"))
      .repartition(col("hb")).write.partitionBy("hb").parquet(s"$dir/hashes")
    val layout = spark.read.parquet(s"$dir/hashes")
    val totalFiles = layout.inputFiles.length
    val bloom = HashBloom.build(corpusH, "h", DedupIndex.BloomBuckets)

    // batch: 5 redelivered duplicates + 40 fresh docs
    val batch = ((0 until 5).map(i => (1000L + i, s"landed corpus document body $i")) ++
      (0 until 40).map(i => (2000L + i, s"entirely fresh submission $i")))
      .toDF("doc_id", "text")
    val hashed = batch.withColumn("_h", sha2($"text", 256))
    val keptDf = DedupIndex.exactNewPruned(hashed, layout, bloom,
      DedupIndex.BloomBuckets, parts)

    // identity vs the plain anti-join
    val plain = hashed.join(corpusH, hashed("_h") === corpusH("h"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val (_, scans) = graft.plans.PlanMetrics.measureWithScans(keptDf)
    val kept = keptDf.select("doc_id").as[Long].collect().toSet
    assert(kept == plain, s"onlyPruned=${kept -- plain} onlyPlain=${plain -- kept}")
    assert((1000L until 1005L).forall(!kept.contains(_)), "dups must drop")
    assert((2000L until 2040L).forall(kept.contains), "fresh docs must survive")

    // the pruning evidence: maybe rows (5 dups + ~1% fp of 40) can hit at
    // most a handful of the 64 partitions — the probe must have OPENED
    // only those, not the whole layout
    assert(scans.files < totalFiles / 2,
      s"probe opened ${scans.files} of $totalFiles layout files — no pruning happened")

    // empty-maybe edge: an all-fresh batch whose rows all probe false
    // skips the corpus entirely (hitParts empty → no isin, no join)
    val allFresh = (0 until 10).map(i => (3000L + i, s"never seen text $i"))
      .toDF("doc_id", "text").withColumn("_h", sha2($"text", 256))
    val freshMaybe = HashBloom.withMaybe(allFresh, bloom, "_h",
      DedupIndex.BloomBuckets).filter(col("_maybe")).count()
    val freshKept = DedupIndex.exactNewPruned(allFresh, layout, bloom,
      DedupIndex.BloomBuckets, parts).select("doc_id").as[Long].collect().toSet
    assert(freshKept == (3000L until 3010L).toSet,
      s"all-fresh batch must pass whole (maybe=$freshMaybe)")
  }

  test("dedupBatchBloomPruned: full gate (exact + near-dup) equals dedupBatch") {
    import graft.sources.HashBloom
    import org.apache.spark.sql.functions._
    val corpus = (0 until 40).map(i => (i.toLong,
      s"corpus document number $i with enough words to shingle " +
        "reliably across the minhash window")).toDF("doc_id", "text")
    val batch = ((0 until 10).map(i => (100L + i,
      s"corpus document number $i with enough words to shingle " +
        "reliably across the minhash window")) ++
      (0 until 10).map(i => (300L + i,
        s"wholly fresh batch document $i sharing no phrasing at all " +
          "with anything the corpus has ever landed"))).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_idx_pruned").toString + "/idx"
    val idx = DedupIndex.create(spark, corpus, dir, buckets = 4)
    val cH = spark.table(idx.hashes)
    val cB = spark.table(idx.bands)
    val parts = 16
    cH.withColumn("hb", pmod(xxhash64(col("h")), lit(parts.toLong)).cast("int"))
      .repartition(col("hb")).write.partitionBy("hb").parquet(s"$dir/pruned")
    val layout = spark.read.parquet(s"$dir/pruned")
    val cBloom = HashBloom.build(cH, "h", DedupIndex.BloomBuckets)
    val viaPruned = DedupIndex.dedupBatchBloomPruned(batch, layout, cB, cBloom,
      bloomBuckets = DedupIndex.BloomBuckets, parts = parts)
      .select("doc_id").as[Long].collect().toSet
    val viaExact = DedupIndex.dedupBatch(batch, cH, cB)
      .select("doc_id").as[Long].collect().toSet
    assert(viaPruned == viaExact,
      s"onlyPruned=${viaPruned -- viaExact} onlyExact=${viaExact -- viaPruned}")
  }
}
