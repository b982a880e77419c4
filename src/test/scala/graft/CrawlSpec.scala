package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.driver.{Crawl, Windows}
import graft.sources.Resilience

/** E2e spec for the composed crawl driver (`EC2/main.py` + `fetcher.py`
  * flow) — fixture fetchers, deterministic clock, driven through
  * [[Windows.step]] like PipelineSpec drives the Lambda ETL. */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val noWait = Resilience.Clock(() => 0L, _ => (), () => 0.5)
  private def limiter = new Resilience.SlidingWindowRateLimiter(
    Seq((1000, 1L)), noWait)
  private def breaker = new Resilience.CircuitBreaker(clock = noWait)

  private def players(rows: (String, String, String, Int)*): DataFrame =
    rows.toDF("puuid", "rank", "tier", "lp")

  test("highEloUnion stops after the rank that reaches the cap; list may overshoot") {
    val fetched = scala.collection.mutable.ListBuffer[String]()
    def fetchRank(r: String): Option[DataFrame] = {
      fetched += r
      Some(Map(
        "challenger" -> players(("p1", "I", "challenger", 900), ("p2", "I", "challenger", 880)),
        "grandmaster" -> players(("p3", "I", "grandmaster", 700), ("p3b", "I", "grandmaster", 690)),
        "master" -> players(("p4", "I", "master", 500))).apply(r))
    }
    val (frames, total) = Crawl.highEloUnion(fetchRank, cap = 3)
    // grandmaster crosses the cap → master never fetched; total overshoots
    assert(fetched.toList == List("challenger", "grandmaster"))
    assert(total == 4 && frames.size == 2)
  }

  test("lowEloUnion paginates until empty and breaks out mid-division at the cap") {
    val calls = scala.collection.mutable.ListBuffer[(String, Int)]()
    def fetchPage(t: String, d: String, page: Int): Option[DataFrame] = {
      calls += ((d, page))
      if (d == "I" && page <= 2)
        Some(players((s"low_${d}_${page}_a", "I", t, 50), (s"low_${d}_${page}_b", "I", t, 40)))
      else Some(players())
    }
    val (frames, total) = Crawl.lowEloUnion(fetchPage, cap = 3, already = 0)
    // page 2 crosses the cap → divisions II/III/IV never probed
    assert(calls.toList == List(("I", 1), ("I", 2)))
    assert(total == 4 && frames.size == 2)
    // already at the cap → no page is ever fetched
    val (none, t2) = Crawl.lowEloUnion(fetchPage, cap = 3, already = 3)
    assert(none.isEmpty && t2 == 3)
  }

  test("lowEloUnion evaluates each page exactly once (ADVICE r09: no isEmpty+count pair)") {
    // pages materialize through a side-effecting RDD map, so every PLAN
    // EVALUATION of a page increments the counter once per row — the
    // old isEmpty-then-count pair scored ~3 per 2-row page, single-count
    // scores exactly 2. The counter lives in a static object (a local
    // AtomicInteger would be serialized INTO the task closure and the
    // task would increment its private copy).
    PageEvalProbe.reset()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "puuid STRING, rank STRING, tier STRING, lp INT")
    def countingPage(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1).map { r =>
          PageEvalProbe.evals.incrementAndGet(); r
        },
        schema)
    def fetchPage(t: String, d: String, page: Int): Option[DataFrame] =
      if (d == "I" && page <= 2)
        Some(countingPage(Seq(
          org.apache.spark.sql.Row(s"low_${d}_${page}_a", "I", t, 50),
          org.apache.spark.sql.Row(s"low_${d}_${page}_b", "I", t, 40))))
      else Some(countingPage(Nil))
    val (frames, total) = Crawl.lowEloUnion(fetchPage,
      tiers = Seq("BRONZE"), divisions = Seq("I"))
    assert(total == 4 && frames.size == 2)
    assert(PageEvalProbe.evals.get() == 4,
      s"4 rows over 2 non-empty pages must evaluate once each; " +
        s"saw ${PageEvalProbe.evals.get()} row evals")
  }

  test("fetchMatchListsDistributed: same envelope as the driver form; each slice honors its budget") {
    import org.apache.spark.sql.functions.{col, explode, not}
    val puuids = (1 to 24).map(i => f"p$i%02d")
    val bad = Set("p05", "p17")
    val window = Windows.WindowState(1000L, 2000L)
    // 404 → immediate give-up (no backoff sleeps perturbing the logical
    // clocks); everything else returns a deterministic id list
    def fetch(p: String, w: Windows.WindowState): Resilience.Outcome[Seq[String]] =
      if (bad(p)) Resilience.Status(404)
      else Resilience.Ok(Seq(s"m-$p-1", s"m-$p-2", s"shared-${w.startEpoch}"))

    // driver-sequential baseline
    val base = Crawl.fetchMatchLists(puuids, window, fetch, limiter, breaker,
      clock = noWait)
    val baseOk = base.collect { case Crawl.Matches(p, ids) => p -> ids }.toMap
    val baseFailed = base.collect { case Crawl.Failed(p) => p }.toSet

    // distributed: 8 req / 120 s global budget over 4 slices → each
    // partition-local limiter gets 2 req / 120 s; logical clocks start
    // at 0 and advance only through limiter sleeps
    FanoutProbe.reset()
    val out = Crawl.fetchMatchListsDistributed(
      puuids.toDF("puuid"), window, FanoutProbe.recording(fetch),
      limits = Seq((8, 120L)), numSlices = 4,
      clockFactory = () => FanoutProbe.newClock()).cache()

    val gotOk = out.filter(not(col("failed")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val gotFailed = out.filter(col("failed"))
      .collect().map(_.getString(0)).toSet
    assert(gotOk == baseOk, "distributed fan-out diverged from the driver form")
    assert(gotFailed == baseFailed)

    // identical ENVELOPE through the same downstream path
    val ranks = Seq(("p01", 900)).toDF("puuid", "lp")
    val envBase = Crawl.envelope(ranks,
      baseOk.values.flatten.toSeq.toDF("matchId")).collect().toSeq
    val envDist = Crawl.envelope(ranks,
      out.filter(not(col("failed")))
        .select(explode(col("matchIds")).as("matchId"))).collect().toSeq
    assert(envBase == envDist)

    // budget proof, per slice: on each partition's own clock, request
    // i+2 is at least one full window after request i (2 req / 120 s);
    // since every slice holds this independently, the aggregate under
    // any common clock stays ≤ 8 req / 120 s
    val byPart = FanoutProbe.calls()
    assert(byPart.size == 4, s"expected 4 slices, saw ${byPart.keySet}")
    assert(byPart.values.map(_.length).sum == 24)
    byPart.foreach { case (part, ts) =>
      // round-robin starts at a random offset, so slices hold 5-7 rows;
      // the budget claim is spacing, which holds for any count: request
      // i+2 sits a full window after request i (2 req / 120 s slice)
      val sorted = ts.sorted
      sorted.drop(2).zip(sorted).foreach { case (later, earlier) =>
        assert(later >= earlier + 120000L,
          s"partition $part burst past its slice: $sorted")
      }
    }
    out.unpersist()
  }

  test("walkMatchesDistributed: batches/leftovers/report equal the driver form; each slice honors its budget") {
    val ids = (1 to 30).map(i => f"m$i%02d") // already sorted: the declared walk order
    val bad = Set("m05", "m17")
    def doc(id: String) = s"""{"matchId":"$id","k":1}"""
    def fm(id: String): Resilience.Outcome[String] =
      if (bad(id)) Resilience.Status(404) else Resilience.Ok(doc(id))
    def ft(id: String): Resilience.Outcome[String] = Resilience.Ok(doc(id))
    def collectLand(buf: scala.collection.mutable.Map[(String, Int), Set[(String, Long, String)]])
        : (DataFrame, String, Int) => Unit =
      (df, kind, n) => {
        buf((kind, n)) = df.collect()
          .map(r => (r.getAs[String]("matchId"), r.getAs[Long]("k"),
            r.getAs[String]("source"))).toSet
        ()
      }

    // driver-sequential baseline at cadence (4, 2)
    val baseLanded = scala.collection.mutable.Map[(String, Int), Set[(String, Long, String)]]()
    val base = Crawl.walkMatches(spark, ids, fm, ft, limiter, breaker,
      deadlineEpoch = Long.MaxValue, clock = noWait, source = "crawl",
      matchBatchSize = 4, timelineBatchSize = 2, land = collectLand(baseLanded))

    // distributed: 8 req / 120 s global over 4 slices → 2 req / 120 s each
    FanoutProbe.reset()
    val distLanded = scala.collection.mutable.Map[(String, Int), Set[(String, Long, String)]]()
    val dist = Crawl.walkMatchesDistributed(ids.toDF("matchId"),
      FanoutProbe.recordingDoc(fm), FanoutProbe.recordingDoc(ft),
      limits = Seq((8, 120L)), numSlices = 4,
      clockFactory = () => FanoutProbe.newClock(),
      matchBatchSize = 4, timelineBatchSize = 2, land = collectLand(distLanded))

    // report equality: totals, no-data count, batch counts, empty tail
    assert((dist.total, dist.noData, dist.matchBatches, dist.timelineBatches) ==
      (base.total, base.noData, base.matchBatches, base.timelineBatches))
    assert(dist.total == 28 && dist.noData == 2 && dist.unprocessed.isEmpty)
    // batch-for-batch landed content equality: walk order is sorted ids
    // in BOTH forms, so batch k of each kind holds the same docs
    assert(distLanded.keySet == baseLanded.keySet)
    baseLanded.foreach { case (key, rows) =>
      assert(distLanded(key) == rows, s"batch $key diverged from the driver form")
    }

    // budget proof per slice: 2 requests per id, 2 req / 120 s slice —
    // on each partition's own clock request i+2 is a full window after
    // request i, so the aggregate stays ≤ 8 req / 120 s
    val byPart = FanoutProbe.calls()
    assert(byPart.size == 4, s"expected 4 slices, saw ${byPart.keySet}")
    assert(byPart.values.map(_.length).sum == 60) // 30 ids × 2 requests
    byPart.foreach { case (part, ts) =>
      val sorted = ts.sorted
      sorted.drop(2).zip(sorted).foreach { case (later, earlier) =>
        assert(later >= earlier + 120000L,
          s"partition $part burst past its slice: $sorted")
      }
    }
  }

  test("walkMatchesDistributed deadline: per-slice tails, no id lost, leftovers sorted") {
    val ids = (1 to 24).map(i => f"d$i%02d")
    def ok(id: String): Resilience.Outcome[String] = Resilience.Ok(s"""{"matchId":"$id"}""")
    val landed = scala.collection.mutable.ListBuffer[(String, Int, Set[String])]()
    FanoutProbe.reset()
    // 2 req / 120 s per slice: each id costs 2 requests, so a slice's
    // second id pushes its logical clock to 120 s — the 100 s deadline is
    // then observed before its THIRD id: exactly 2 ids processed per slice
    val walk = Crawl.walkMatchesDistributed(ids.toDF("matchId"), ok, ok,
      limits = Seq((8, 120L)), numSlices = 4, deadlineEpoch = 100L,
      clockFactory = () => FanoutProbe.newClock(),
      matchBatchSize = 200, timelineBatchSize = 50,
      land = (df, kind, n) => {
        landed += ((kind, n, df.collect().map(_.getAs[String]("matchId")).toSet)); ()
      })
    assert(walk.total == 8 && walk.noData == 0)
    assert(walk.unprocessed.length == 16)
    // exactly-one-of invariant: processed ∪ unprocessed = all, disjoint
    val processed = landed.collect { case ("match", _, s) => s }.flatten.toSet
    assert(processed.size == 8)
    assert((processed ++ walk.unprocessed).toSet == ids.toSet)
    assert(processed.intersect(walk.unprocessed.toSet).isEmpty)
    // the leftover tail is sorted — ready for the deterministic re-drive
    assert(walk.unprocessed == walk.unprocessed.sorted)
    // remainder batches flushed under the cadence even on the cut walk
    assert(walk.matchBatches == 1 && walk.timelineBatches == 1)
  }

  test("walkMatchesDistributedOnePass: batches equal the loop form; O(1) jobs regardless of batch count") {
    val ids = (1 to 30).map(i => f"o$i%02d")
    val bad = Set("o07", "o21")
    def doc(id: String) = s"""{"matchId":"$id","k":1}"""
    def fm(id: String): Resilience.Outcome[String] =
      if (bad(id)) Resilience.Status(404) else Resilience.Ok(doc(id))
    def ft(id: String): Resilience.Outcome[String] = Resilience.Ok(doc(id))
    val nw = Resilience.Clock(() => 0L, _ => (), () => 0.5)

    type Landed = scala.collection.mutable.Map[(String, Int), Set[(String, Long, String)]]
    def newLanded: Landed = scala.collection.mutable.Map.empty

    // loop-form baseline at cadence (4, 2)
    val loopLanded = newLanded
    val loop = Crawl.walkMatchesDistributed(ids.toDF("matchId"), fm, ft,
      limits = Seq((1000, 1L)), numSlices = 4, clockFactory = () => nw,
      matchBatchSize = 4, timelineBatchSize = 2,
      land = (df, kind, n) => {
        loopLanded((kind, n)) = df.collect()
          .map(r => (r.getAs[String]("matchId"), r.getAs[Long]("k"),
            r.getAs[String]("source"))).toSet
        ()
      })

    def runOnePass(group: String, mBs: Int, tBs: Int, sink: Landed): Crawl.Walk = {
      spark.sparkContext.setJobGroup(group, group)
      try Crawl.walkMatchesDistributedOnePass(ids.toDF("matchId"), fm, ft,
        limits = Seq((1000, 1L)), numSlices = 4, clockFactory = () => nw,
        matchBatchSize = mBs, timelineBatchSize = tBs,
        landAll = (df, kind) => {
          df.collect().foreach { r =>
            val key = (kind, r.getAs[Int]("batch"))
            sink(key) = sink.getOrElse(key, Set.empty) +
              ((r.getAs[String]("matchId"), r.getAs[Long]("k"),
                r.getAs[String]("source")))
          }
          ()
        })
      finally spark.sparkContext.clearJobGroup()
    }

    val oneLanded = newLanded
    val one = runOnePass("onepass_a", 4, 2, oneLanded)
    // report + batch-for-batch landed content equal the loop form
    assert((one.total, one.noData, one.matchBatches, one.timelineBatches) ==
      (loop.total, loop.noData, loop.matchBatches, loop.timelineBatches))
    assert(oneLanded.keySet == loopLanded.keySet)
    loopLanded.foreach { case (key, rows) =>
      assert(oneLanded(key) == rows, s"batch $key diverged from the loop form")
    }

    // O(1)-passes proof: halving both batch sizes DOUBLES the batch count
    // but must not change the number of scheduled jobs — the loop form
    // pays one inference + one land job per batch, the one-pass form one
    // inference + one landAll action per KIND
    val fineLanded = newLanded
    val fine = runOnePass("onepass_b", 2, 1, fineLanded)
    assert(fine.matchBatches == 2 * one.matchBatches &&
      fine.timelineBatches == 2 * one.timelineBatches)
    assert(fineLanded.values.flatten.toSet == oneLanded.values.flatten.toSet)
    def jobs(g: String): Int = {
      // statusTracker feeds from the async listener bus: poll to settle
      var prev = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
      var tries = 0
      while (cur != prev && tries < 50) {
        prev = cur; Thread.sleep(100)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
        tries += 1
      }
      cur
    }
    val (jA, jB) = (jobs("onepass_a"), jobs("onepass_b"))
    assert(jA > 0 && jA == jB,
      s"one-pass job count must be independent of batch count: $jA vs $jB")
  }

  test("runProcessorDistributed: same report/player-map/cleanup as the driver processor") {
    val dir = Files.createTempDirectory("graft_proc_dist").toString
    val w = Windows.WindowState(0, 2 * 24 * 3600)
    val key = seedEnvelope(dir, w, (1 to 7).map(i => s"m$i"))
    val landed = scala.collection.mutable.ListBuffer[(String, Int, Long)]()
    def doc(id: String) = s"""{"matchId":"$id","k":1}"""
    def fm(id: String): Resilience.Outcome[String] =
      if (id == "m3") Resilience.Status(404) else Resilience.Ok(doc(id))
    def ft(id: String): Resilience.Outcome[String] = Resilience.Ok(doc(id))
    // locally scoped so the factory closure ships without the spec instance
    val nw = Resilience.Clock(() => 0L, _ => (), () => 0.5)
    val rep = Crawl.runProcessorDistributed(spark, dir, key, w, fm, ft,
      limits = Seq((1000, 1L)), numSlices = 4,
      clockFactory = () => nw,
      matchBatchSize = 4, timelineBatchSize = 2,
      land = (df, kind, n) => { landed += ((kind, n, df.count())); () }).get
    // identical shape to the driver processor's run over the same envelope
    assert(rep.total == 6 && rep.noData == 1)
    assert(rep.matchBatches == 2 && rep.timelineBatches == 3)
    assert(landed.collect { case ("match", _, n) => n }.toList == List(4, 2))
    assert(landed.collect { case ("match_timeline", _, n) => n }.toList == List(2, 2, 2))
    assert(rep.leftoverKey.isEmpty)
    assert(spark.read.json(s"$dir/${rep.playerMapKey}").columns.contains("ranked_map"))
    assert(!new java.io.File(s"$dir/$key").exists())
  }

  test("runProcessorDistributed default landing: one-pass partitionBy, batch_<n> layout parity") {
    val dir = Files.createTempDirectory("graft_proc_dist_op").toString
    val w = Windows.WindowState(0, 2 * 24 * 3600)
    val key = seedEnvelope(dir, w, (1 to 7).map(i => s"m$i"))
    def doc(id: String) = s"""{"matchId":"$id","k":1}"""
    def fm(id: String): Resilience.Outcome[String] =
      if (id == "m3") Resilience.Status(404) else Resilience.Ok(doc(id))
    def ft(id: String): Resilience.Outcome[String] = Resilience.Ok(doc(id))
    val nw = Resilience.Clock(() => 0L, _ => (), () => 0.5)
    val rep = Crawl.runProcessorDistributed(spark, dir, key, w, fm, ft,
      limits = Seq((1000, 1L)), numSlices = 4, clockFactory = () => nw,
      matchBatchSize = 4, timelineBatchSize = 2).get
    assert(rep.total == 6 && rep.matchBatches == 2 && rep.timelineBatches == 3)
    // layout parity with the loop form: batch_<n> dirs under outRoot/<kind>,
    // contents = parsed doc fields + source (partitionBy drops batch)
    val b1 = spark.read.json(s"$dir/match/batch_1")
    assert(b1.columns.toSet == Set("matchId", "k", "source"))
    // sorted walk order: ok docs are m1,m2,m4,m5,m6,m7 → batch 1 holds 4
    assert(b1.select("matchId").as[String].collect().sorted.toSeq ==
      Seq("m1", "m2", "m4", "m5"))
    assert(new java.io.File(s"$dir/match/batch_2").isDirectory)
    assert((1 to 3).forall(n =>
      new java.io.File(s"$dir/match_timeline/batch_$n").isDirectory))
    assert(!new java.io.File(s"$dir/match/batch=1").exists())
  }

  test("stampedPlayers evolves drifted tier schemas and renames rank (P3/P8)") {
    // the reference's highElo and LowElo entries carry different field
    // sets (league-v4 entries vs challengerleagues entries); the union
    // must null-pad either side, like every heterogeneous append
    val high = Seq(("p1", "I", "challenger", 900)).toDF("puuid", "rank", "tier", "lp")
      .withColumn("_ord", org.apache.spark.sql.functions.lit(0))
    val low = Seq(("p5", "II", "DIAMOND", true)).toDF("puuid", "rank", "tier", "veteran")
      .withColumn("_ord", org.apache.spark.sql.functions.lit(1))
    val stamped = Crawl.stampedPlayers(List(high, low), timestamp = 777L)
    assert(stamped.columns.contains("player_rank") && !stamped.columns.contains("rank"))
    val byId = stamped.collect().map(r => r.getAs[String]("puuid") -> r).toMap
    assert(byId("p1").getAs[Any]("veteran") == null) // high side null-padded
    assert(byId("p5").getAs[Any]("lp") == null)      // low side null-padded
    assert(byId("p5").getAs[Boolean]("veteran"))
    assert(stamped.collect().forall(_.getAs[Long]("time_stamp") == 777L))
  }

  test("rankMap keeps the LAST occurrence of a duplicated puuid (dict-comprehension twin)") {
    val a = players(("dup", "I", "challenger", 900)).withColumn("_ord",
      org.apache.spark.sql.functions.lit(0))
    val b = players(("dup", "I", "grandmaster", 700)).withColumn("_ord",
      org.apache.spark.sql.functions.lit(1))
    val m = Crawl.rankMap(a.unionByName(b)).collect()
    assert(m.length == 1 && m.head.getAs[String]("tier") == "grandmaster")
  }

  test("envelope write retries transport failures and reports exhaustion") {
    val dir = Files.createTempDirectory("graft_env").toString
    val env = Crawl.envelope(
      players(("p1", "I", "challenger", 900))
        .withColumn("_ord", org.apache.spark.sql.functions.lit(0))
        .transform(Crawl.rankMap),
      Seq("m1", "m2", "m1").toDF("matchId"))
    assert(Crawl.writeEnvelopeWithRetry(env, s"$dir/ok.json", clock = noWait))
    // parent is a FILE → every attempt throws → false after the budget
    val blocker = new java.io.File(s"$dir/blocked"); blocker.createNewFile()
    assert(!Crawl.writeEnvelopeWithRetry(env, s"$dir/blocked/x.json", clock = noWait))
  }

  private def seedEnvelope(dir: String, w: Windows.WindowState, ids: Seq[String]): String = {
    val env = Crawl.envelope(
      players(("p1", "I", "challenger", 900))
        .withColumn("_ord", org.apache.spark.sql.functions.lit(0))
        .transform(Crawl.rankMap),
      ids.toDF("matchId"))
    val key = Crawl.envelopeKey(w)
    assert(Crawl.writeEnvelopeWithRetry(env, s"$dir/$key", clock = noWait))
    key
  }

  test("processor flow: batch cadence, no-data skips, player map, matchlist cleanup") {
    val dir = Files.createTempDirectory("graft_proc").toString
    val w = Windows.WindowState(0, 2 * 24 * 3600)
    val key = seedEnvelope(dir, w, (1 to 7).map(i => s"m$i"))
    val landed = scala.collection.mutable.ListBuffer[(String, Int, Long)]()
    val land = (df: DataFrame, kind: String, n: Int) => {
      landed += ((kind, n, df.count())); ()
    }
    def doc(id: String) = s"""{"matchId":"$id","k":1}"""
    def fm(id: String): Resilience.Outcome[String] =
      if (id == "m3") Resilience.Status(404) else Resilience.Ok(doc(id))
    def ft(id: String): Resilience.Outcome[String] = Resilience.Ok(doc(id))
    val rep = Crawl.runProcessor(spark, dir, key, w, fm, ft, limiter, breaker,
      clock = noWait, matchBatchSize = 4, timelineBatchSize = 2, land = land).get
    // m3 404s on the MATCH side → counted no_data, skipped on BOTH sides
    assert(rep.total == 6 && rep.noData == 1)
    // reference cadence at (4, 2): 6 docs → 2 match batches (4 + final 2),
    // 3 timeline batches (2+2 + final 2)
    assert(rep.matchBatches == 2 && rep.timelineBatches == 3)
    assert(landed.collect { case ("match", _, n) => n }.toList == List(4, 2))
    assert(landed.collect { case ("match_timeline", _, n) => n }.toList == List(2, 2, 2))
    assert(rep.leftoverKey.isEmpty)
    // rank map re-landed under player-maps/, matchlist envelope deleted
    assert(spark.read.json(s"$dir/${rep.playerMapKey}").columns.contains("ranked_map"))
    assert(!new java.io.File(s"$dir/$key").exists())
  }

  test("processor exit-7 analog: a missing or garbage envelope yields None after retries") {
    val dir = Files.createTempDirectory("graft_proc_err").toString
    val w = Windows.WindowState(0, 100)
    def ok(id: String): Resilience.Outcome[String] = Resilience.Ok("{}")
    // missing key: every pull attempt fails → None (manual intervention)
    assert(Crawl.runProcessor(spark, dir, "backfill/matchlists/nope.json", w,
      ok, ok, limiter, breaker, clock = noWait).isEmpty)
    // garbage envelope (json, but not an envelope): rejected, None
    graft.sinks.Writers.jsonDump(Seq((1, "x")).toDF("a", "b"),
      s"$dir/backfill/matchlists/garbage.json")
    assert(Crawl.runProcessor(spark, dir, "backfill/matchlists/garbage.json", w,
      ok, ok, limiter, breaker, clock = noWait).isEmpty)
  }

  test("processor deadline: leftovers keep the CURRENT unprocessed id (fixed off-by-one)") {
    val dir = Files.createTempDirectory("graft_proc_dl").toString
    val w = Windows.WindowState(0, 2 * 24 * 3600)
    val key = seedEnvelope(dir, w, (1 to 7).map(i => s"m$i"))
    // clock starts at 0; after two successful matches the third fetch
    // pushes time past the deadline, so the loop stops AT m3
    var now = 0L
    val ticking = Resilience.Clock(() => now, _ => (), () => 0.5)
    var fetched = 0
    def fm(id: String): Resilience.Outcome[String] = {
      fetched += 1
      if (fetched == 3) now = 100_000_000L // past deadline for next check
      Resilience.Ok(s"""{"matchId":"$id"}""")
    }
    val rep = Crawl.runProcessor(spark, dir, key, w, fm,
      id => Resilience.Ok(s"""{"matchId":"$id"}"""),
      limiter, breaker, deadlineEpoch = 1000L, clock = ticking,
      land = (_, _, _) => ()).get
    // m1, m2, m3 processed (deadline observed before m4); leftovers start
    // at m4 — the current unprocessed id is NOT lost (processor.py:112
    // saves from i+1 and silently drops it; declared divergence)
    assert(rep.total == 3)
    assert(rep.leftoverKey.isDefined && rep.leftoverKey.get.contains("_4_matches"))
    val rest = spark.read.parquet(s"$dir/${rep.leftoverKey.get}")
      .collect().map(_.getString(0)).toSet
    assert(rest == Set("m4", "m5", "m6", "m7"))
    // matchlist deleted even on the leftover path (stored safely above)
    assert(!new java.io.File(s"$dir/$key").exists())
  }

  test("zero players found: fetcher still lands an empty envelope; processor no-ops on it") {
    val dir = Files.createTempDirectory("graft_empty").toString
    val w = Windows.WindowState(0, 2 * 24 * 3600)
    val key = Crawl.runFetcher(spark, dir, w, maxPlayers = 10, nowEpoch = 1L,
      fetchRank = _ => None, fetchPage = (_, _, _) => Some(players()),
      fetchMatches = (_, _) => fail("no players, no matchList calls"),
      limiter, breaker, clock = noWait)
    assert(key.contains(Crawl.envelopeKey(w)))
    val env = spark.read.json(s"$dir/${key.get}")
    assert(env.count() == 1)
    val rep = Crawl.runProcessor(spark, dir, key.get, w,
      id => Resilience.Ok(s"""{"m":"$id"}"""), id => Resilience.Ok(s"""{"m":"$id"}"""),
      limiter, breaker, clock = noWait, land = (_, _, _) => ()).get
    assert(rep.total == 0 && rep.noData == 0 && rep.leftoverKey.isEmpty)
  }

  test("main run: fetcher → processor → leftovers; the NEXT run drains the deadline tail") {
    val dir = Files.createTempDirectory("graft_main").toString
    val day = 24 * 3600L
    def doc(id: String) = s"""{"matchId":"$id"}"""
    var now = 0L
    val ticking = Resilience.Clock(() => now, _ => (), () => 0.5)
    var fetched = 0
    val src1 = Crawl.Sources(
      fetchRank = r => if (r == "challenger")
        Some(players(("p1", "I", "challenger", 900), ("p2", "I", "challenger", 880)))
        else Some(players()),
      fetchPage = (_, _, _) => Some(players()),
      fetchMatchList = (p, _) =>
        Resilience.Ok(if (p == "p1") Seq("m1", "m2", "m3", "m4") else Seq("m3", "m5", "m6")),
      fetchMatch = id => {
        fetched += 1
        if (fetched == 4) now = 100_000_000L // deadline passes after m4
        Resilience.Ok(doc(id))
      },
      fetchTimeline = id => Resilience.Ok(doc(id)))
    val w1 = Windows.WindowState(2 * day, 4 * day)
    val (key1, rep1, red1) = Crawl.run(spark, dir, w1, maxPlayers = 5,
      nowEpoch = 4 * day, src1, limiter, breaker, deadlineEpoch = 1000L,
      clock = ticking)
    assert(key1.isDefined)
    // processor walked m1..m4 of the deduped sorted list m1..m6, then hit
    // the deadline: m5, m6 landed as leftovers
    assert(rep1.get.total == 4 && rep1.get.leftoverKey.isDefined)
    // the same run's leftover phase is already past the deadline: the
    // fresh file is rewritten with its own (unshrunk) tail, not drained
    assert(red1.map(_.drained) == Seq(false))
    // run 2, next window, nothing new to crawl, fresh time budget: the
    // leftover phase re-drives and drains run 1's tail
    val src2 = src1.copy(
      fetchMatchList = (_, _) => Resilience.Ok(Nil),
      fetchMatch = id => Resilience.Ok(doc(id)))
    val (key2, rep2, red2) = Crawl.run(spark, dir, Windows.WindowState(4 * day, 6 * day),
      maxPlayers = 5, nowEpoch = 6 * day, src2, limiter, breaker, clock = noWait)
    assert(key2.isDefined && rep2.get.total == 0)
    assert(red2.map(r => (r.total, r.drained)) == Seq((2, true)))
    val loDir = new java.io.File(s"$dir/backfill/leftovers")
    assert(!Option(loDir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith("_matches")), "drained leftover file must be deleted")
  }

  test("leftover re-drive: drain deletes, deadline overwrites in place, rest untouched") {
    import graft.sinks.Writers
    val dir = Files.createTempDirectory("graft_redrive").toString
    val lo = s"$dir/backfill/leftovers"
    Writers.saveLeftovers(Seq("a1", "a2").toDF("key"), s"$lo/leftovers_0_100_2_matches")
    Writers.saveLeftovers(Seq("b1", "b2", "b3").toDF("key"), s"$lo/leftovers_100_200_3_matches")
    Writers.saveLeftovers(Seq("c1").toDF("key"), s"$lo/leftovers_200_300_1_matches")
    // fetcher-side PLAYER leftovers are not match ids: must be ignored
    Writers.saveLeftovers(Seq("p9").toDF("key"), s"$lo/players")
    def ok(id: String): Resilience.Outcome[String] = Resilience.Ok(s"""{"matchId":"$id"}""")
    // test mode skips everything (leftover.py:31-35)
    assert(Crawl.runLeftovers(spark, dir, ok, ok, limiter, breaker,
      clock = noWait, testMode = true).isEmpty)
    assert(spark.read.parquet(s"$lo/leftovers_0_100_2_matches").count() == 2)
    // deadline hits after a1, a2, b1: file A drains, B is cut at b2
    var now = 0L
    val ticking = Resilience.Clock(() => now, _ => (), () => 0.5)
    var fetched = 0
    def fm(id: String): Resilience.Outcome[String] = {
      fetched += 1
      if (fetched == 3) now = 100_000_000L
      ok(id)
    }
    val reps = Crawl.runLeftovers(spark, dir, fm, ok, limiter, breaker,
      deadlineEpoch = 1000L, clock = ticking, land = (_, _, _) => ())
    assert(reps.map(r => (r.file, r.total, r.drained)) == Seq(
      ("leftovers_0_100_2_matches", 2, true),
      ("leftovers_100_200_3_matches", 1, false)))
    // A deleted; B overwritten in place with its tail; C and players untouched
    assert(!new java.io.File(s"$lo/leftovers_0_100_2_matches").exists())
    assert(spark.read.parquet(s"$lo/leftovers_100_200_3_matches")
      .collect().map(_.getString(0)).toSet == Set("b2", "b3"))
    assert(spark.read.parquet(s"$lo/leftovers_200_300_1_matches").count() == 1)
    assert(spark.read.parquet(s"$lo/players").count() == 1)
  }

  test("fetcher flow e2e through Windows.step: cap, pre-truncation rank map, retry, dedup, leftovers") {
    val dir = Files.createTempDirectory("graft_crawl").toString
    val statePath = s"$dir/state.json"
    val day = 24 * 3600L
    def fetchRank(r: String): Option[DataFrame] = Some(Map(
      "challenger" -> players(("p1", "I", "challenger", 900), ("p2", "I", "challenger", 880)),
      "grandmaster" -> players(("p3", "I", "grandmaster", 700), ("p3b", "I", "grandmaster", 690)),
      "master" -> players(("p4", "I", "master", 500))).apply(r))
    val pageCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    def fetchPage(t: String, d: String, p: Int): Option[DataFrame] = {
      pageCalls.incrementAndGet(); Some(players())
    }
    // p2's first attempt is rate-limited (guardedFetch must retry), p3
    // 404s (client error: fail fast → leftover), the rest succeed
    val p2Attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    def fetchMatches(p: String, w: Windows.WindowState): Resilience.Outcome[Seq[String]] = {
      assert(w.startEpoch == 2 * day && w.endEpoch == 4 * day) // window reaches the source
      p match {
        case "p1" => Resilience.Ok(Seq("m1", "m2"))
        case "p2" =>
          if (p2Attempts.getAndIncrement() == 0)
            Resilience.Status(429, retryAfterSec = Some(0))
          else Resilience.Ok(Seq("m2", "m3"))
        case "p3" => Resilience.Status(404)
        case other => fail(s"capped-out player fetched: $other")
      }
    }
    val advanced = Windows.step(statePath, nowEpoch = 4 * day,
      bootstrap = Windows.WindowState(0, 2 * day)) { w =>
      val key = Crawl.runFetcher(spark, dir, w, maxPlayers = 3, nowEpoch = 4 * day,
        fetchRank, fetchPage, fetchMatches, limiter, breaker, clock = noWait)
      assert(key.contains(s"backfill/matchlists/match_ids_${2 * day}_${4 * day}_.json"))
    }
    assert(advanced.contains(Windows.WindowState(2 * day, 4 * day)))
    // cap=3 reached in the high tiers → low-elo pagination never probed
    assert(pageCalls.get() == 0)
    val env = spark.read.json(s"$dir/backfill/matchlists/match_ids_${2 * day}_${4 * day}_.json")
    val row = env.head()
    // dedup: m2 appears from both p1 and p2, once in the envelope
    assert(row.getAs[scala.collection.Seq[String]]("matchlist").toSeq ==
      Seq("m1", "m2", "m3"))
    // rank map is built from the FULL pre-truncation list: p3b is in the
    // map even though the fan-out stopped at 3 players (and master was
    // never fetched — the cap stopped the ladder at grandmaster, exactly
    // the reference's break)
    val mapped = env.select("ranked_map.*").schema.fieldNames.toSet
    assert(mapped == Set("p1", "p2", "p3", "p3b"))
    assert(env.select("ranked_map.p3b.player_rank").head().getString(0) == "I")
    // the 404'd player landed as a K8 leftover for the next run's re-drive
    val leftovers = spark.read.parquet(s"$dir/backfill/leftovers/players")
      .collect().map(_.getString(0)).toSet
    assert(leftovers == Set("p3"))
    // state persisted only after the fetcher succeeded
    assert(graft.sinks.Writers.readState(statePath).contains((2 * day, 4 * day)))
  }

  test("inferDocSchema: bounded sample, top-level drift escalates, late docs never parsed") {
    import spark.implicits._
    // 400 docs: homogeneous {"a": i} except — key drift at #300 (new
    // top-level field), malformed at #350, TYPE drift at #399
    val raw = (0 until 400).map { i =>
      if (i == 300) s"""{"a":$i,"late":"drifted"}"""
      else if (i == 350) "not json at all"
      else if (i == 399) """{"a":"type-drifted"}"""
      else s"""{"a":$i}"""
    }
    val docs = spark.createDataset(raw)
    val schema = Crawl.inferDocSchema(docs, sampleN = 16)
    // the canary caught the new top-level key (#300, far past the
    // sample window) and handed the malformed doc (#350) to the json
    // reader, which surfaces it as _corrupt_record — full-inference
    // behavior for exactly the docs that needed it
    assert(schema.fieldNames.toSet == Set("a", "late", "_corrupt_record"),
      schema.treeString)
    // the BOUNDEDNESS proof, behavioral not asserted-on-internals:
    // doc #399 types `a` as a string, so a full inference would widen
    // `a` to StringType. The sampled schema keeps LongType — the only
    // way that happens is if #399 (same top-level keys, so never
    // flagged) was never fed to type inference at all.
    assert(schema("a").dataType == org.apache.spark.sql.types.LongType,
      s"late docs leaked into inference: ${schema("a").dataType}")
    // the full-read twin DOES widen — the documented difference the
    // sampleN = 0 setting exists for
    assert(spark.read.json(docs).schema("a").dataType ==
      org.apache.spark.sql.types.StringType)

    // no drift → the sample alone decides, second inference never runs
    val clean = spark.createDataset((0 until 200).map(i => s"""{"a":$i}"""))
    assert(Crawl.inferDocSchema(clean, sampleN = 16).fieldNames.toSeq == Seq("a"))

    // all-malformed and empty inputs stay total (no exceptions)
    val junk = spark.createDataset(Seq("x", "y"))
    assert(Crawl.inferDocSchema(junk, 4).fieldNames.toSet == Set("_corrupt_record"))
    assert(Crawl.inferDocSchema(spark.emptyDataset[String], 4).isEmpty)
  }
}

/** Static page-evaluation counter (see FanoutProbe for why an object:
  * task closures get serialized even in local mode, so a captured
  * AtomicInteger would be a per-task copy). */
object PageEvalProbe {
  val evals = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = evals.set(0)
}

/** Same-JVM side channel for the distributed fan-out spec. Closures
  * reference this SINGLETON by class — object members are not serialized
  * with the closure — so in local mode the executor tasks and the
  * asserting test observe one shared instance. Each partition registers
  * its own logical clock (starts at 0, advances only through limiter
  * sleeps); the recording wrapper logs (partitionId, partition-local
  * now) at every fetch call. */
object FanoutProbe {
  import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
  import java.util.concurrent.atomic.AtomicLong
  private val clocks = new ConcurrentHashMap[Int, AtomicLong]()
  private val times = new ConcurrentLinkedQueue[(Int, Long)]()

  def reset(): Unit = { clocks.clear(); times.clear() }

  def newClock(): Resilience.Clock = {
    val now = new AtomicLong(0L)
    clocks.put(org.apache.spark.TaskContext.getPartitionId(), now)
    Resilience.Clock(() => now.get(),
      ms => { if (ms > 0) now.addAndGet(ms); () }, () => 0.5)
  }

  def recording(
      fetch: (String, Windows.WindowState) => Resilience.Outcome[Seq[String]])
      : (String, Windows.WindowState) => Resilience.Outcome[Seq[String]] =
    (p, w) => {
      val pid = org.apache.spark.TaskContext.getPartitionId()
      times.add((pid, clocks.get(pid).get()))
      fetch(p, w)
    }

  /** Same side channel for the distributed match walk's doc fetches. */
  def recordingDoc(fetch: String => Resilience.Outcome[String])
      : String => Resilience.Outcome[String] =
    id => {
      val pid = org.apache.spark.TaskContext.getPartitionId()
      times.add((pid, clocks.get(pid).get()))
      fetch(id)
    }

  def calls(): Map[Int, Seq[Long]] = {
    import scala.jdk.CollectionConverters._
    times.iterator().asScala.toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
  }
}
