package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** The two shuffle-shaping techniques the 100 TB design leans on:
  * salting (hot keys) and bucketing (co-located joins with no exchange). */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  /** Max records read from a shuffle by any single task while running
    * `body` — the "did one reducer eat the whole key?" metric. */
  private def maxTaskShuffleRead(body: => Unit): Long = {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          max.getAndUpdate(c => math.max(c, t.taskMetrics.shuffleReadMetrics.recordsRead))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    max.get()
  }

  /** Run `body` with the shuffled-join/reducer-distribution confs the
    * metric tests need (no broadcast escape hatch, no tiny-shuffle
    * coalescing that would merge every reducer into one task). */
  private def withShuffleConfs(extra: (String, String)*)(body: => Unit): Unit = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions") ++ extra.map(_._1)
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join and salts the shuffle key") {
    // 90% of fact rows share one hot key
    val facts = (1 to 1000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i.toLong))
      .toDF("key", "v")
    val dims = (Seq("HOT") ++ (1 to 1000).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim_$i") }.toDF("key", "attr")
    val salted = Skew.saltedJoin(facts, dims, Seq("key"), "v", saltN = 8)
    val plain = facts.join(dims, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.select("key", "v", "attr").except(plain.select("key", "v", "attr")).isEmpty)
    assert(plain.select("key", "v", "attr").except(salted.select("key", "v", "attr")).isEmpty)
  }

  test("saltedCollect equals direct collect_list modulo order") {
    val df = (1 to 500).map(i => ("user", i.toLong)).toDF("key", "v")
    val out = Skew.saltedCollect(df, "key", "v", "v", saltN = 4)
      .select($"vs").as[Seq[Long]].head()
    assert(out == (1L to 500L))
  }

  test("saltedJoin bounds the hot reducer: max task shuffle-read drops vs the unsalted plan") {
    // hot-key fixture: 90% of 50k fact rows carry ONE key — the shape
    // where an unsalted shuffled join funnels the key through one reducer
    val facts = (1 to 50000)
      .map(i => (if (i % 10 == 0) s"k${i % 97}" else "HOT", i.toLong))
      .toDF("key", "v")
    val dims = (Seq("HOT") ++ (0 until 97).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim_$i") }.toDF("key", "attr")

    // force the shuffled join (no broadcast escape hatch), turn off AQE's
    // skew splitting — it is the built-in fallback for sort-merge skew;
    // THIS test isolates what explicit salting buys when AQE can't
    // re-plan (see Skew scaladoc)
    withShuffleConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val unsaltedMax = maxTaskShuffleRead {
        facts.join(dims, Seq("key")).write.format("noop").mode("overwrite").save()
      }
      val saltedMax = maxTaskShuffleRead {
        Skew.saltedJoin(facts, dims, Seq("key"), "v", saltN = 16)
          .write.format("noop").mode("overwrite").save()
      }
      // unsalted: the hot key's ~45k rows land on one reducer; salted:
      // they spread across 16 (key, salt) reducers
      assert(unsaltedMax >= 45000L,
        s"fixture lost its skew: unsalted max task read $unsaltedMax")
      assert(saltedMax * 3 <= unsaltedMax,
        s"salting did not bound the hot reducer: salted=$saltedMax unsalted=$unsaltedMax")
    }
  }

  test("bucketed tables join without an exchange on the join key") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "pa")
      val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("id", "pb")
      a.write.mode("overwrite")
        .option("path", s"$wh/ta").bucketBy(8, "id").sortBy("id").saveAsTable("ta")
      b.write.mode("overwrite")
        .option("path", s"$wh/tb").bucketBy(8, "id").sortBy("id").saveAsTable("tb")
      val joined = spark.table("ta").join(spark.table("tb"), "id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucket join: a sort-merge join with NO shuffle exchange
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(plan.contains("SelectedBucketsCount"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ta")
      spark.sql("DROP TABLE IF EXISTS tb")
    }
  }

  test("bucketed dedup index: only the batch shuffles into the anti-join (VERDICT r07)") {
    val d = "/root/testdata/sf0.001"
    val boundary = graft.queries.LlmOps.CorpusBoundaryId
    val docs = graft.sources.Tables.documents(spark, d)
    val batch = docs.filter($"doc_id" >= boundary)
      .select($"doc_id", sha2($"text", 256).as("h"))
    val idx = graft.sources.DedupIndex.corpusHashes(spark, d, boundary)
    withShuffleConfs() {
      val bucketed = batch.join(idx, Seq("h"), "left_anti")
      // the corpus index scan uses its buckets; the single exchange in the
      // plan is the batch side shuffling INTO the bucket layout
      // (executedPlan, not sparkPlan: exchanges exist only after
      // EnsureRequirements)
      val p = bucketed.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount"), s"index scan lost bucketing:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
        s"expected exactly the batch-side exchange:\n$p")
      // same rows as the inline (derive-the-corpus-hashes-per-query) form
      val inline = batch.join(
        docs.filter($"doc_id" < boundary).select(sha2($"text", 256).as("h")).distinct(),
        Seq("h"), "left_anti")
      assert(bucketed.select("doc_id").except(inline.select("doc_id")).isEmpty &&
        inline.select("doc_id").except(bucketed.select("doc_id")).isEmpty,
        "bucketed index anti-join diverged from the inline form")
      // measured: the records crossing the shuffle are the batch's, not
      // the corpus index's (the index is ~4/5 of the fixture)
      val batchRows = batch.count()
      val read = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.shuffleReadMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        bucketed.write.format("noop").mode("overwrite").save()
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(read.get() == batchRows,
        s"shuffle carried ${read.get()} records, expected the $batchRows batch rows only")
    }
  }

  test("dedup_hash keeper phase: hashing the group key cuts the dedup shuffle payload-width-fold") {
    // 100 distinct 2 KB payloads, 4 copies each, copies scattered across
    // partitions so map-side combine cannot collapse them locally — the
    // exchange really carries per-partition exemplars in both forms.
    // Payload bytes are RANDOM: shuffle-write metrics count compressed
    // bytes, and a constant filler would compress below the hash width
    val rnd = new scala.util.Random(7)
    val payloads = (0 until 100).map(i =>
      f"payload-$i%03d-" + rnd.alphanumeric.take(2000).mkString)
    val rows = (0 until 400).map(i => (i.toLong, payloads(i % 100)))
      .toDF("id", "payload").repartition(8).localCheckpoint(true)

    def shuffleWriteBytes(body: => Unit): Long = {
      val sum = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            sum.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      sum.get()
    }

    withShuffleConfs() {
      // keeper derivation, naive: the 2 KB payload IS the grouping key —
      // it crosses the exchange and feeds the agg hash table as a key
      var naiveKeepers: Set[Long] = null
      val naiveBytes = shuffleWriteBytes {
        naiveKeepers = rows.groupBy($"payload").agg(min($"id").as("id"))
          .select("id").as[Long].collect().toSet
      }
      // keeper derivation, dedup_hash shape: a 32 B content hash keys the
      // exchange; the payload never leaves the map side
      var hashKeepers: Set[Long] = null
      val hashBytes = shuffleWriteBytes {
        hashKeepers = rows.groupBy(sha2($"payload", 256).as("_h"))
          .agg(min($"id").as("id"))
          .select("id").as[Long].collect().toSet
      }
      // identical keeper sets (first-wins: min id per content group)
      assert(hashKeepers == naiveKeepers)
      assert(hashKeepers == (0L until 100L).toSet,
        "min id per payload group must be the first copy")
      // the measured point: the keeper shuffle shrinks by roughly the
      // payload/hash width ratio (~2 KB → 64 B hex ≈ 30×; assert ≥ 5×)
      assert(hashBytes * 5 < naiveBytes,
        s"hash keeper phase wrote $hashBytes shuffle bytes vs naive " +
          s"$naiveBytes — expected a payload-width-fold drop")
      // phase 2 lands the full kept rows through the unique-id semi join
      val kept = rows.join(
        rows.groupBy(sha2($"payload", 256).as("_h")).agg(min($"id").as("id"))
          .select("id"),
        Seq("id"), "left_semi")
      assert(kept.count() == 100 &&
        kept.select("payload").distinct().count() == 100)
    }
  }

  test("two-phase per-source cap: equals the single-window form; bounds the max task") {
    import graft.queries.LlmOps
    import org.apache.spark.sql.expressions.Window
    // multi-source fixture with doc_id gaps (segments are doc_id ranges,
    // so gaps and sources interleaving across segments are the tricky part)
    val rnd = new scala.util.Random(7)
    val docs = (0 until 5000).map(i => (i * 7L + rnd.nextInt(5), s"s${i % 3}"))
      .distinct.toDF("doc_id", "source")
    val naive = docs.select($"doc_id", $"source",
        row_number().over(Window.partitionBy($"source").orderBy($"doc_id")).as("rn"))
      .filter($"rn" <= 30)
    val twoPhase = LlmOps.capPerSource(docs, 30)
    assert(twoPhase.except(naive).isEmpty && naive.except(twoPhase).isEmpty,
      "two-phase cap diverged from the single-window semantics")
    // granule invariance: any segment size yields the same rows
    for (shift <- Seq(3, 10)) {
      val alt = LlmOps.capPerSource(docs, 30, segShift = shift)
      assert(alt.except(naive).isEmpty && naive.except(alt).isEmpty,
        s"cap output depends on segment granule (shift=$shift)")
    }

    // one-source worst case: the naive plan funnels ALL rows through one
    // reducer; the two-phase plan's row-level windows are segment-bounded
    // (and segments past the cap never even join). For rank-FILTER caps
    // specifically, Spark's InferWindowGroupLimit already pushes a
    // map-side top-k (cap×#maps rows still meet one reducer) — disable it
    // here to measure the raw single-window shape; pack_sequences'
    // running sum has no such rescue at all.
    val one = (0 until 20000).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    withShuffleConfs("spark.sql.optimizer.excludedRules" ->
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit") {
      val naiveMax = maxTaskShuffleRead {
        one.select($"doc_id", $"source",
            row_number().over(Window.partitionBy($"source").orderBy($"doc_id")).as("rn"))
          .filter($"rn" <= 30)
          .write.format("noop").mode("overwrite").save()
      }
      val twoPhaseMax = maxTaskShuffleRead {
        LlmOps.capPerSource(one, 30).write.format("noop").mode("overwrite").save()
      }
      assert(naiveMax >= 20000L,
        s"fixture lost its point: naive max task read $naiveMax")
      assert(twoPhaseMax <= 2000L,
        s"two-phase cap still funnels a source through one task: $twoPhaseMax")
    }
  }

  test("two-phase packing: equals the single-window form; bounds the max task") {
    import graft.queries.LlmOps
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val docs = (0 until 5000).map(i =>
      (i * 7L + rnd.nextInt(5), s"s${i % 3}", 1 + rnd.nextInt(50)))
      .distinctBy(_._1).toDF("doc_id", "source", "n_tok")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("bin", floor((sum($"n_tok").over(w) - 1) / lit(256)).cast("int"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
    val twoPhase = LlmOps.packIntoBins(docs, 256)
    assert(twoPhase.except(naive).isEmpty && naive.except(twoPhase).isEmpty,
      "two-phase packing diverged from the single-window semantics")
    // granule invariance: any segment size yields the same bins
    for (shift <- Seq(3, 10)) {
      val alt = LlmOps.packIntoBins(docs, 256, segShift = shift)
      assert(alt.except(naive).isEmpty && naive.except(alt).isEmpty,
        s"packing output depends on segment granule (shift=$shift)")
    }

    val one = (0 until 20000).map(i => (i.toLong, "only", 1 + i % 50))
      .toDF("doc_id", "source", "n_tok")
    withShuffleConfs() {
      val naiveMax = maxTaskShuffleRead {
        one.withColumn("bin", floor((sum($"n_tok").over(w) - 1) / lit(256)).cast("int"))
          .groupBy($"source", $"bin")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
          .write.format("noop").mode("overwrite").save()
      }
      val twoPhaseMax = maxTaskShuffleRead {
        LlmOps.packIntoBins(one, 256).write.format("noop").mode("overwrite").save()
      }
      assert(naiveMax >= 20000L,
        s"fixture lost its point: naive max task read $naiveMax")
      assert(twoPhaseMax * 4 <= naiveMax,
        s"two-phase packing still funnels a source through one task: " +
          s"twoPhase=$twoPhaseMax naive=$naiveMax")
    }
  }

  test("connected components: a giant component's hot label key is split by AQE skew join") {
    // VERDICT r06 item 5: Components claims AQE's skew-join split handles
    // the hot label key of a giant component — prove it. Star graph: node
    // 0 adjacent to every other node ⇒ 100% of nodes in ONE component and
    // every label-join probe hits key 0.
    val n = 30000
    val edges = (1 to n).map(i => (0L, i.toLong)).toDF("src", "dst")
    withShuffleConfs(
      // scale AQE's skew thresholds down to fixture size (defaults are
      // 256 MB — production-sized); the PLAN mechanism is what's under test
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      var labels: Array[(Long, Long)] = null
      val maxRead = maxTaskShuffleRead {
        labels = graft.operators.Components.connectedComponents(edges, "src", "dst")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      assert(labels.length == n + 1 && labels.forall(_._2 == 0L),
        "star graph did not collapse to one component labeled 0")
      // unsplit, the key-0 join partition is read whole by one task
      // (~n rows); split, no task reads more than a bounded slice
      assert(maxRead <= n / 3,
        s"hot label key was not split: one task read $maxRead of ~$n rows")
    }
  }

  test("range-clustered write: files cover disjoint key ranges (min/max skipping works)") {
    val out = Files.createTempDirectory("graft_rangeclust").toString + "/ev"
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    graft.sinks.Writers.clusteredByRange(events, "user_id", out, numFiles = 8)
    // per-file (min, max) of the cluster key, via input_file_name
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1, "fixture produced a single file — nothing to prove")
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"file key ranges overlap: $ranges")
    }
    // and the layout actually feeds the scan: a point-range filter reads
    // fewer rows out of the scan than the full table holds
    val all = spark.read.parquet(out).count()
    val some = spark.read.parquet(out).filter($"user_id" < 5).count()
    assert(some < all)
  }

  test("targeted delete: only hit files rewritten, untouched files byte-identical") {
    import java.security.MessageDigest
    val out = Files.createTempDirectory("graft_del").toString + "/docs"
    val data = spark.range(1000).select(
      col("id").as("doc_id"),
      concat(lit("payload for document "), col("id")).as("text"))
    graft.sinks.Writers.clusteredByRange(data, "doc_id", out, numFiles = 10)
    def snapshot(): Map[String, String] =
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
        .map { f =>
          f.getName -> MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    val before = snapshot()
    assert(before.size == 10)

    // two dropped ids at opposite ends of the key space: the clustered
    // layout pins them to (at most) two files
    val stats = graft.sinks.Writers.deleteWhere(spark, out, "doc_id", Seq(5L, 995L))
    assert(stats.filesTotal == 10)
    assert(stats.rowsDeleted == 2L)
    assert(stats.filesRewritten >= 1 && stats.filesRewritten <= 2,
      s"min/max skipping failed: ${stats.filesRewritten} of 10 files rewritten")

    // every surviving original file is byte-identical; originals of the
    // rewritten files are gone
    val after = snapshot()
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size == 10 - stats.filesRewritten)
    untouched.foreach(f => assert(before(f) == after(f), s"$f changed bytes"))

    // the dataset is exactly original-minus-dropped, all columns intact
    val got = spark.read.parquet(out)
    assert(got.count() == 998)
    assert(got.filter($"doc_id".isin(5L, 995L)).isEmpty)
    assert(got.filter($"doc_id" === 6L).head().getString(1) == "payload for document 6")

    // deleting already-absent keys is a no-op touching nothing
    val again = graft.sinks.Writers.deleteWhere(spark, out, "doc_id", Seq(5L, 995L))
    assert(again.filesRewritten == 0 && again.rowsDeleted == 0L)
    assert(snapshot() == after)
  }

  test("targeted delete: a crash between move-in and delete-originals loses no retained row") {
    val out = Files.createTempDirectory("graft_del_crash").toString + "/docs"
    val data = spark.range(100).select(
      col("id").as("doc_id"),
      concat(lit("payload "), col("id")).as("text"))
    graft.sinks.Writers.clusteredByRange(data, "doc_id", out, numFiles = 4)

    // inject a crash AFTER replacements moved in, BEFORE originals delete
    val boom = intercept[RuntimeException] {
      graft.sinks.Writers.deleteWhereKeys(spark, out, "doc_id",
        Seq(10L, 90L).toDF("doc_id"),
        onBeforeDeleteOriginals = () => throw new RuntimeException("crash in swap window"))
    }
    assert(boom.getMessage == "crash in swap window")

    // the at-least-once guarantee: every retained row is still present
    // (some now twice — originals plus replacements); NOTHING was lost.
    // The opposite ordering would have deleted the originals first and a
    // crash here would silently lose every retained row of the hit files.
    val surviving = spark.read.parquet(out)
    val retainedCounts = surviving.filter(!$"doc_id".isin(10L, 90L))
      .groupBy($"doc_id").count()
    assert(retainedCounts.count() == 98, "a retained key vanished in the crash window")
    assert(retainedCounts.filter($"count" > 2).isEmpty)
    // the interrupted swap is detectable: staging dir still beside the data
    val parent = new java.io.File(out).getParentFile
    assert(parent.listFiles().exists(_.getName.startsWith("docs.delete_")),
      "crash left no staging-dir evidence for recovery tooling")
    // re-running the delete completes it: dropped keys gone, retained
    // keys all present (dupes from the crash window remain — exact
    // dedup downstream reclaims them; nothing can reclaim a lost row)
    graft.sinks.Writers.deleteWhereKeys(spark, out, "doc_id", Seq(10L, 90L).toDF("doc_id"))
    val healed = spark.read.parquet(out)
    assert(healed.filter($"doc_id".isin(10L, 90L)).isEmpty)
    assert(healed.select("doc_id").distinct().count() == 98)
  }

  test("set-valued targeted delete: 1e5 keys take the semi-join path, no wide IN") {
    val out = Files.createTempDirectory("graft_del_set").toString + "/docs"
    val data = spark.range(2000).select(
      col("id").as("doc_id"),
      concat(lit("payload "), col("id")).as("text"))
    graft.sinks.Writers.clusteredByRange(data, "doc_id", out, numFiles = 8)

    // 10^5-key sweep (most keys absent — the realistic opt-out shape:
    // requests accumulated across a fleet, this dataset holds a slice)
    val keys = spark.range(100000).select((col("id") * 7).as("doc_id"))
    // discovery refuses to build a 10^5-wide IN: above the limit the
    // plan is a semi-join (hitFiles returns no literal list)
    val (files, lits) = graft.sinks.Writers.hitFiles(spark, out, "doc_id",
      keys.distinct(), inListLimit = graft.sinks.Writers.DeleteInListLimit)
    assert(lits.isEmpty, "10^5 keys must not take the literal-IN path")
    assert(files.nonEmpty)

    val stats = graft.sinks.Writers.deleteWhereKeys(spark, out, "doc_id", keys)
    // dataset holds doc_id 0..1999; multiples of 7 in range: ceil(2000/7)
    val expectedDropped = (0 until 2000).count(_ % 7 == 0)
    assert(stats.rowsDeleted == expectedDropped.toLong)
    val got = spark.read.parquet(out)
    assert(got.count() == 2000L - expectedDropped)
    assert(got.filter($"doc_id" % 7 === 0).isEmpty)
    // and the bounded fast path on the same API: a tiny key frame stays IN-list
    val (_, litsSmall) = graft.sinks.Writers.hitFiles(spark, out, "doc_id",
      Seq(3L, 5L).toDF("doc_id"), inListLimit = graft.sinks.Writers.DeleteInListLimit)
    assert(litsSmall.nonEmpty, "bounded key sets should keep the footer-skipping IN path")
  }

  test("keyed upsert: rewrites only hit files, replaced/inserted split exact, untouched files byte-identical") {
    val out = Files.createTempDirectory("graft_ups").toString + "/players"
    val data = spark.range(1000).select(
      col("id").as("puuid"),
      concat(lit("rank for "), col("id")).as("rank"))
    graft.sinks.Writers.clusteredByRange(data, "puuid", out, numFiles = 10)
    def snapshot(): Map[String, String] =
      new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
        .map { f =>
          f.getName -> java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    val before = snapshot()

    // two existing keys at opposite ends (replace) + one fresh key (insert)
    val batch = Seq(
      (5L, "UPDATED 5"), (995L, "UPDATED 995"), (5000L, "NEW 5000"))
      .toDF("puuid", "rank")
    val stats = graft.sinks.Writers.upsertByKey(spark, out, "puuid", batch)
    assert(stats.filesTotal == 10)
    assert(stats.rowsReplaced == 2L && stats.rowsInserted == 1L)
    assert(stats.filesRewritten >= 1 && stats.filesRewritten <= 2,
      s"clustered layout should bound the rewrite: ${stats.filesRewritten} of 10")

    val after = snapshot()
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size == 10 - stats.filesRewritten)
    untouched.foreach(f => assert(before(f) == after(f), s"$f changed bytes"))

    // merged content: one row per key, updates visible, insert landed
    val got = spark.read.parquet(out)
    assert(got.count() == 1001)
    assert(got.groupBy($"puuid").count().filter($"count" > 1).isEmpty)
    assert(got.filter($"puuid" === 5L).head().getString(1) == "UPDATED 5")
    assert(got.filter($"puuid" === 5000L).head().getString(1) == "NEW 5000")
    assert(got.filter($"puuid" === 6L).head().getString(1) == "rank for 6")

    // a batch with a duplicate key has no deterministic winner: fail fast,
    // land nothing
    val dup = Seq((7L, "a"), (7L, "b")).toDF("puuid", "rank")
    intercept[IllegalArgumentException] {
      graft.sinks.Writers.upsertByKey(spark, out, "puuid", dup)
    }
    assert(snapshot() == after, "failed upsert must not touch the dataset")
    // column-shape mismatch fails fast too
    intercept[IllegalArgumentException] {
      graft.sinks.Writers.upsertByKey(spark, out, "puuid",
        Seq((8L, "x", 1)).toDF("puuid", "rank", "extra"))
    }
  }

  test("keyed upsert: a crash between move-in and delete-originals loses no row") {
    val out = Files.createTempDirectory("graft_ups_crash").toString + "/players"
    val data = spark.range(100).select(
      col("id").as("puuid"), concat(lit("rank "), col("id")).as("rank"))
    graft.sinks.Writers.clusteredByRange(data, "puuid", out, numFiles = 4)
    val batch = Seq((10L, "UPDATED"), (500L, "NEW")).toDF("puuid", "rank")
    val boom = intercept[RuntimeException] {
      graft.sinks.Writers.upsertByKey(spark, out, "puuid", batch,
        onBeforeDeleteOriginals = () => throw new RuntimeException("crash in swap window"))
    }
    assert(boom.getMessage == "crash in swap window")
    // at-least-once: every key present (the hit file's keys may be doubled
    // — old copy + rewritten copy; the updated key's OLD value may coexist
    // with the new one until the swap completes). Nothing lost.
    val surviving = spark.read.parquet(out)
    assert(surviving.select("puuid").distinct().count() == 101)
    // re-running the same upsert heals: updates win, no key missing
    graft.sinks.Writers.upsertByKey(spark, out, "puuid", batch)
    val healed = spark.read.parquet(out)
    assert(healed.select("puuid").distinct().count() == 101)
    assert(healed.filter($"puuid" === 10L && $"rank" === "UPDATED").count() >= 1)
    assert(healed.filter($"puuid" === 10L && $"rank" =!= "UPDATED").isEmpty)
  }

  test("mutator coordination: a compaction racing an upsert serializes on the root claim; zero lost rows") {
    val out = Files.createTempDirectory("graft_race").toString + "/docs"
    spark.range(200).select(col("id").as("puuid"),
        concat(lit("r"), col("id")).as("rank"))
      .repartition(8).write.parquet(out)

    // an upsert PAUSED inside its swap window (replacements moved in,
    // originals not yet deleted) — the window a racing compaction's
    // delete phase could corrupt before the root claim existed
    val inWindow = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val upsertErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val batch = Seq((10L, "UPDATED"), (9999L, "NEW")).toDF("puuid", "rank")
    val upsert = new Thread(() => {
      try graft.sinks.Writers.upsertByKey(spark, out, "puuid", batch,
        onBeforeDeleteOriginals = () => { inWindow.countDown(); release.await() })
      catch { case t: Throwable => upsertErr.set(t); inWindow.countDown() }
    })
    upsert.start()
    assert(inWindow.await(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(upsertErr.get() == null, s"upsert failed: ${upsertErr.get()}")

    // fail-fast contract: a mutator that cannot get the root in its wait
    // window aborts loudly instead of interleaving
    val boom = intercept[IllegalStateException] {
      graft.sinks.Writers.compactSmallFiles(spark, out,
        targetBytes = 1L << 20, minBytes = 1L << 20, claimMaxWaitMs = 300L)
    }
    assert(boom.getMessage.contains("mutator claim"))

    // wait contract: a patient compaction blocks until the upsert
    // releases the root, then runs to completion — zero lost rows
    val compacted = new java.util.concurrent.atomic.AtomicReference[
      graft.sinks.Writers.CompactStats]()
    val compactErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compact = new Thread(() => {
      try compacted.set(graft.sinks.Writers.compactSmallFiles(spark, out,
        targetBytes = 1L << 20, minBytes = 1L << 20, claimMaxWaitMs = 120000L))
      catch { case t: Throwable => compactErr.set(t) }
    })
    compact.start()
    Thread.sleep(500)
    assert(compacted.get() == null && compactErr.get() == null,
      "compaction must not run inside the upsert's claim window")
    release.countDown()
    upsert.join(120000); compact.join(120000)
    assert(upsertErr.get() == null, s"upsert failed: ${upsertErr.get()}")
    assert(compactErr.get() == null, s"compaction failed: ${compactErr.get()}")
    assert(compacted.get() != null && compacted.get().filesCompacted >= 2)

    val healed = spark.read.parquet(out)
    assert(healed.select("puuid").distinct().count() == 201)
    assert(healed.groupBy($"puuid").count().filter($"count" > 1).isEmpty)
    assert(healed.filter($"puuid" === 10L).head().getString(1) == "UPDATED")
    // both mutators released the root: no claim file remains
    assert(!new java.io.File(out, graft.sources.ArtifactStore.RootClaim).exists())
  }

  test("small-file compaction: merges undersized files, big files byte-identical, content unchanged") {
    val out = Files.createTempDirectory("graft_cmp").toString + "/docs"
    // 16 tiny files + 1 "big" one (forced above the floor by payload width)
    spark.range(160).select(col("id").as("doc_id"),
        concat(lit("doc "), col("id")).as("text"))
      .repartition(16).write.parquet(out)
    spark.range(1000, 1400).select(col("id").as("doc_id"),
        concat(lit("big payload "), col("id"),
          lit(" " + "x" * 2000)).as("text"))
      .coalesce(1).write.mode("append").parquet(out)
    val fBefore = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val bigName = fBefore.maxBy(_.length).getName
    val bigMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/$bigName"))).map("%02x".format(_)).mkString
    val floor = fBefore.maxBy(_.length).length // everything smaller is "small"
    val contentBefore = spark.read.parquet(out).orderBy("doc_id").collect()

    val stats = graft.sinks.Writers.compactSmallFiles(spark, out,
      targetBytes = 1L << 30, minBytes = floor)
    assert(stats.filesCompacted == 17 - 1, s"expected 16 small files, got $stats")
    assert(stats.filesAfter < stats.filesBefore)
    val fAfter = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(fAfter.length == stats.filesAfter)
    // the big file is untouched on disk
    val bigAfter = fAfter.find(_.getName == bigName)
    assert(bigAfter.isDefined, "big file must survive compaction untouched")
    assert(java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(bigAfter.get.toPath))
      .map("%02x".format(_)).mkString == bigMd5)
    // content is exactly preserved
    val contentAfter = spark.read.parquet(out).orderBy("doc_id").collect()
    assert(contentAfter.sameElements(contentBefore), "compaction changed content")
    // idempotent: a second pass finds nothing under the floor to merge
    // (the compacted outputs exceed it or there is only one of them)
    val again = graft.sinks.Writers.compactSmallFiles(spark, out,
      targetBytes = 1L << 30, minBytes = 1L << 10)
    assert(again.filesCompacted == 0 || again.filesAfter <= stats.filesAfter)
  }

  test("small-file compaction: a crash between move-in and delete-originals loses no row") {
    val out = Files.createTempDirectory("graft_cmp_crash").toString + "/docs"
    spark.range(100).select(col("id").as("doc_id"))
      .repartition(8).write.parquet(out)
    val boom = intercept[RuntimeException] {
      graft.sinks.Writers.compactSmallFiles(spark, out,
        targetBytes = 1L << 30, minBytes = 1L << 30,
        onBeforeDeleteOriginals = () => throw new RuntimeException("crash in swap window"))
    }
    assert(boom.getMessage == "crash in swap window")
    // at-least-once: every id still present (doubled — originals + merged)
    val surviving = spark.read.parquet(out)
    assert(surviving.select("doc_id").distinct().count() == 100)
    assert(surviving.groupBy($"doc_id").count().filter($"count" =!= 2).isEmpty,
      "crash window should leave originals plus exactly one merged copy")
    // re-running merges the leftovers too — compaction is a pure layout
    // move, so the crash-window duplicates persist until exact dedup
    // downstream reclaims them (the same at-least-once contract as the
    // delete/upsert swaps); no id is ever lost
    graft.sinks.Writers.compactSmallFiles(spark, out,
      targetBytes = 1L << 30, minBytes = 1L << 30)
    assert(spark.read.parquet(out).select("doc_id").distinct().count() == 100)
  }

  test("two-phase token budget: equals the single-window form; granule-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source",
        size(split(trim($"text"), " ")).as("n_tokens"))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val twoPhase = asSet(graft.queries.LlmOps.capPerSourceTokens(docs, 800L))
    // reference: the naive whole-source running-sum window
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = asSet(docs
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .filter($"cum_before" < 800))
    assert(twoPhase == naive)
    assert(twoPhase.nonEmpty)
    // output is granule-invariant: only the task bounds move with segShift
    val fine = asSet(graft.queries.LlmOps.capPerSourceTokens(docs, 800L, segShift = 3))
    assert(fine == twoPhase)
    // every source with data survives with at least one doc
    val srcAll = docs.select($"source").distinct().count()
    assert(twoPhase.map(_._2).size.toLong == srcAll)
  }

  test("z-order write: 2-D box predicate prunes more files than a linear layout") {
    // deterministic 64×64 grid, 4 rows per cell — both dimensions spread
    val grid = spark.range(16384).select(
      (col("id") % 64).as("x"),
      ((col("id") / 64).cast("long") % 64).as("y"))
    val zOut = Files.createTempDirectory("graft_zorder").toString + "/z"
    val linOut = Files.createTempDirectory("graft_zorder").toString + "/lin"
    graft.sinks.Writers.clusteredByZOrder(grid, "x", "y", zOut, numFiles = 16)
    graft.sinks.Writers.clusteredByRange(grid, "x", linOut, numFiles = 16)
    // candidate files for the predicate y∈[8,15] — the dimension the
    // linear layout did NOT sort by — decided exactly the way
    // footer-based skipping decides: per-file min/max vs the predicate
    def candidates(path: String): Int = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("y").as("ylo"), max("y").as("yhi"))
      .filter($"yhi" >= 8 && $"ylo" <= 15)
      .count().toInt
    val zFiles = candidates(zOut)
    val linFiles = candidates(linOut)
    // linear-by-x: every file spans the full y range → zero y-skipping
    // (all 16 files are candidates); z-order: each file is a small
    // (x, y) rectangle, so most files' y-boxes miss the predicate
    assert(linFiles == 16, s"x-sorted layout unexpectedly skips on y: $linFiles")
    assert(zFiles <= 8,
      s"z-order pruned too little: z=$zFiles linear=$linFiles of 16 files")
    // identical content either way
    assert(spark.read.parquet(zOut).count() == 16384)
    // and the z-value itself interleaves correctly: z(1,0)=1, z(0,1)=2,
    // z(3,5) = 1·1 + 2·0 + 4·1 + 8·0 + 16·0 + 32·1 = 0b100111 = 39
    val zv = spark.range(1).select(
      graft.sinks.Writers.zValue(lit(1L), lit(0L)).as("a"),
      graft.sinks.Writers.zValue(lit(0L), lit(1L)).as("b"),
      graft.sinks.Writers.zValue(lit(3L), lit(5L)).as("c")).head
    assert(zv.getLong(0) == 1L && zv.getLong(1) == 2L && zv.getLong(2) == 39L)
  }
}
