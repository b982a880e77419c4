package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** Vector similarity semantics + the IVF centroid-assignment step that the
  * label-bucketed oracle query stands in for. */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("scaled-integer cosine matches the analytic value") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val cos = df.select(
      Vectors.cosine(Vectors.dotScaled($"a", $"b"),
        Vectors.normScaled($"a"), Vectors.normScaled($"b")).as("c"))
      .as[Double].head()
    assert(math.abs(cos - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("topKPerKey = exact global top-k per key, rank deterministic") {
    val rows = for (k <- 1 to 3; i <- 1 to 50) yield (k, i.toLong, (i * 37 % 50).toDouble)
    val df = rows.toDF("k", "id", "score").repartition(4)
    val got = Vectors.topKPerKey(df, $"k", $"score", $"id", 5)
      .select($"k", $"id", $"rank", $"score").collect()
      .map(r => (r.getInt(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(t => (-t._3, t._2)).take(5)
    }
    for ((k, top) <- expect; (t, i) <- top.zipWithIndex)
      assert(got((k, i + 1)) == ((t._2, t._3)))
  }

  test("topKPerKeyAgg = topKPerKey bit-identically (ties, NaN, short groups); plan is sort-free") {
    // score values engineered for ORDERING edge cases: duplicated scores
    // (id-ASC tiebreak), a NaN (greatest under Spark's total double
    // order), a group with fewer rows than k
    val rows =
      (for (k <- 1 to 3; i <- 1 to 40) yield (k, i.toLong, (i * 37 % 10).toDouble)) ++
      Seq((1, 99L, Double.NaN), (4, 7L, 1.5), (4, 8L, 1.5))
    val df = rows.toDF("k", "id", "score").repartition(5)
    def collectSet(out: org.apache.spark.sql.DataFrame): Set[(Int, Long, Int, Long)] =
      out.collect().map { r =>
        // the score is compared AS RAW BITS: NaN != NaN under ==, so a
        // Double-typed tuple would never compare equal for the NaN row
        (r.getInt(0), r.getLong(1), r.getInt(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))
      }.toSet
    val win = Vectors.topKPerKey(df, $"k", $"score", $"id", 5)
      .select($"k", $"id", $"rank", $"score")
    val agg = Vectors.topKPerKeyAgg(df, "k", "score", "id", 5)
      .select($"k", $"id", $"rank", $"score")
    assert(collectSet(agg) == collectSet(win),
      "bounded-heap top-k diverged from the window form")
    // the whole point: the aggregate form carries NO sort anywhere —
    // neither a WindowExec sort nor a SortAggregate fallback
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "agg top-k plan regressed to a window")
    assert(!p.contains("SortAggregate"), "top_k_by fell back to SortAggregate")
    assert(p.contains("ObjectHashAggregate"), "top_k_by is not an object hash aggregate")
  }

  test("topKPerKeyAgg: partial buffers merge exactly (k-boundary insertion order)") {
    // 1 group, 2k rows spread over many partitions: every merge path
    // (empty+full, overlap at the k-th slot) is exercised; expected =
    // plain sort-take
    val rows = (1L to 20L).map(i => (1, i, ((i * 13) % 7).toDouble))
    val df = rows.toDF("k", "id", "score").repartition(8)
    val got = Vectors.topKPerKeyAgg(df, "k", "score", "id", 10)
      .orderBy($"rank").select($"id", $"score").as[(Long, Double)].collect().toSeq
    val want = rows.sortBy(t => (-t._3, t._2)).take(10).map(t => (t._2, t._3))
    assert(got == want)
  }

  test("IVF build+probe: clusters recovered; full-probe search = brute force") {
    // two obvious clusters; seeds are vec_id 0 and 1, one from each
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f)), (1L, Array(0.0f, 1.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.1f, 0.95f, 0.0f)),
      (4L, Array(0.95f, 0.05f, 0.1f)), (5L, Array(0.05f, 1.05f, 0.2f)))
      .toDF("vec_id", "embedding")
    val cents = Vectors.buildCentroids(vecs, "vec_id", "embedding", 2)
    assert(cents.count() == 2)
    val assignedDf = Vectors.ivfAssign(vecs, "vec_id", "embedding", cents)
    // the corpus-wide top-1 must be the argmax AGGREGATE, never a
    // window: a window sorts the n·k score stream per partition
    // (9e10 rows at 20M vectors under k≈√n), the agg holds one state
    // per vector
    assert(!assignedDf.queryExecution.executedPlan.toString.contains("Window"),
      "ivfAssign regressed to a window top-1 over the n*k score stream")
    // ...and the aggregate must be HASH, not sort-based: max(struct)
    // has a struct buffer HashAggregateExec cannot hold, so it silently
    // plans SortAggregate and sorts the same n·k stream (the round-16
    // sf100 OOM, r16m/sf100_subset/ — ArgMaxBy exists to keep the
    // buffer two primitive slots)
    assert(!assignedDf.queryExecution.executedPlan.toString.contains("SortAggregate"),
      "ivfAssign regressed to a sort-based aggregate over the n*k score stream")
    assert(assignedDf.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "ivfAssign's argmax is no longer a hash aggregate")
    val assigned = assignedDf
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned(2L) == assigned(0L) && assigned(4L) == assigned(0L))
    assert(assigned(3L) == assigned(1L) && assigned(5L) == assigned(1L))
    // nprobe = k (all buckets) reproduces brute force exactly
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val ivf = Vectors.ivfSearch(vecs, "vec_id", "embedding", cents,
      queries, "qid", "qe", nprobe = 2, k = 3)
      .select($"qid", $"cand_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val brute = {
      val v = vecs.select($"vec_id", $"embedding", Vectors.normScaled($"embedding").as("n2"))
      val q = queries.withColumn("qn", Vectors.normScaled($"qe"))
      val sims = v.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("cand_id"),
          Vectors.cosine(Vectors.dotScaled($"qe", $"embedding"), $"qn", $"n2").as("cos_sim"))
      Vectors.topKPerKey(sims, $"qid", $"cos_sim", $"cand_id", 3)
        .select($"qid", $"cand_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    }
    assert(ivf == brute)
    // nprobe = 1 searches only the query's own cluster
    val narrow = Vectors.ivfSearch(vecs, "vec_id", "embedding", cents,
      queries, "qid", "qe", nprobe = 1, k = 3)
      .select($"qid", $"cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(narrow(0L).subsetOf(Set(2L, 4L)))
    assert(narrow(1L).subsetOf(Set(3L, 5L)))
  }

  test("persisted IVF index: probe-from-disk == one-shot build+search, bit for bit") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f)), (1L, Array(0.0f, 1.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.1f, 0.95f, 0.0f)),
      (4L, Array(0.95f, 0.05f, 0.1f)), (5L, Array(0.05f, 1.05f, 0.2f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    Vectors.writeIndex(vecs, "vec_id", "embedding", 2, idx)
    // the index is two parquet datasets a cluster can share across jobs
    assert(spark.read.parquet(s"$idx/centroids").count() == 2)
    assert(spark.read.parquet(s"$idx/assignments").count() == 6)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"cand_id", $"rank", $"cos_sim").collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    val fromIndex = key(Vectors.ivfSearchIndexed(idx, vecs, "vec_id", "embedding",
      queries, "qid", "qe", nprobe = 2, k = 3))
    val oneShot = key(Vectors.ivfSearch(vecs, "vec_id", "embedding",
      Vectors.buildCentroids(vecs, "vec_id", "embedding", 2),
      queries, "qid", "qe", nprobe = 2, k = 3))
    assert(fromIndex == oneShot)
  }

  test("RP-LSH bands: identical vectors share every band; perturbed ones share at least one") {
    val base = Array.tabulate(32)(i => math.sin(i * 1.7).toFloat)
    val nearDup = base.zipWithIndex.map { case (x, i) =>
      if (i == 3) x + 0.001f else x } // tiny perturbation
    val vecs = Seq(
      (0L, base), (1L, base.clone()), (2L, nearDup),
      (3L, base.map(-_))) // antipode: every plane flips
      .toDF("vec_id", "embedding")
    val keys = Vectors.rpLshBands(vecs, "vec_id", "embedding", planes = 8, bands = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(keys.size == 8) // 4 vectors × 2 bands
    // exact duplicate: both bands agree
    assert((0 to 1).forall(b => keys((0L, b)) == keys((1L, b))))
    // near-duplicate: OR-amplification — at least one band agrees
    assert((0 to 1).exists(b => keys((0L, b)) == keys((2L, b))))
    // antipode: every sign bit flips, so NO band can agree (keys are
    // bitwise complements within the 4-bit band space)
    assert((0 to 1).forall(b => keys((0L, b)) + keys((3L, b)) == 15L))
  }

  test("RP-LSH signatures are partitioning-invariant (exact integer sums)") {
    val rnd = new scala.util.Random(5)
    val vecs = (1 to 60).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    def keysOf(parts: Int) =
      Vectors.rpLshBands(vecs.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // per-(vector, plane) sums are exact longs, so the signature cannot
    // depend on how rows were split across tasks
    assert(keysOf(1) == keysOf(7))
  }

  test("IVF absorb: new vectors join the frozen index and are immediately findable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_absorb").toString
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f)
    val initial = (0L until 40L).map(i => (i, vec()))
    val initDf = initial.toDF("vec_id", "embedding")
    Vectors.writeIndex(initDf, "vec_id", "embedding", k = 4, dir)
    // absorb 10 new vectors against the frozen centroids
    val absorbed = (100L until 110L).map(i => (i, vec()))
    val absDf = absorbed.toDF("vec_id", "embedding")
    Vectors.absorbIndex(dir, absDf, "vec_id", "embedding")
    // queries = the absorbed embeddings under fresh ids: routing and
    // assignment share the argmax, so nprobe=1 must already find the twin
    val corpus = initDf.unionByName(absDf)
    val queries = absorbed.map { case (i, v) => (i + 1000L, v) }.toDF("qid", "qv")
    val hits = Vectors.ivfSearchIndexed(dir, corpus, "vec_id", "embedding",
        queries, "qid", "qv", nprobe = 1, k = 1)
      .select($"qid", $"cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(absorbed.forall { case (i, _) => hits(i + 1000L) == i },
      s"absorbed vectors not top-1 for their own embeddings: $hits")
  }

  test("IVF absorb follows the build's routing (route_k stamp); pre-r18 stamps absorb flat") {
    // round 18 (r18m/absorb_sf1000_flat.json): absorbIndex flat-assigned
    // every batch — the n·k tax the build's ivfCoarseK routing removed —
    // 510.9 s for a 2 M batch against the standing 20 M index. The
    // contract now: absorb assigns THROUGH THE SAME routing the index
    // was built with (route_k in the meta stamp), so an absorbed vector
    // lands exactly where writeIndex would have put it; stamps that
    // predate route_k keep the flat behavior they were built with.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_route").toString
    val rnd = new scala.util.Random(7)
    def vecs(r: Range) = r.map(i => (i.toLong,
      Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f))).toDF("vec_id", "embedding")
    Vectors.writeIndex(vecs(0 until 60), "vec_id", "embedding", k = 4, dir,
      routeCoarseK = 2)
    val cent = spark.read.parquet(s"$dir/centroids")
    val batch = vecs(100 until 112)
    Vectors.absorbIndex(dir, batch, "vec_id", "embedding")
    def assignedOf(min: Long, max: Long): Map[Long, Int] =
      spark.read.parquet(s"$dir/assignments")
        .filter($"vec_id" >= min && $"vec_id" < max)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaRouted = Vectors.ivfAssignRouted(batch, "vec_id", "embedding", cent, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assignedOf(100, 112) == viaRouted,
      "absorbed assignments diverge from the build's routed assignment")
    // back-compat: rewrite the stamp WITHOUT route_k (a pre-r18 index)
    // — the next absorb must assign FLAT, the behavior those indexes
    // were built with
    val f = graft.sources.ArtifactStore.fs(dir)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "_graft_ann_meta.json"), true)
    out.write("""{"built_n": 60, "k": 4}""".getBytes("UTF-8")); out.close()
    val batch2 = vecs(200 until 212)
    Vectors.absorbIndex(dir, batch2, "vec_id", "embedding")
    val viaFlat = Vectors.ivfAssign(batch2, "vec_id", "embedding", cent)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assignedOf(200, 212) == viaFlat,
      "pre-r18 (route_k-less) stamp did not absorb flat")
  }

  test("IVF absorb staleness gate: fires past 2x the design point, not at 1.9x; override + pre-stamp escape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_stale").toString
    val rnd = new scala.util.Random(11)
    def vecs(r: Range) = r.map(i => (i.toLong,
      Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))).toDF("vec_id", "embedding")
    Vectors.writeIndex(vecs(0 until 100), "vec_id", "embedding", k = 4, dir)
    // below the absolute floor (2^16 rows) the RATIO is meaningless and
    // absorbs go unchecked regardless of how far past 2x they land —
    // toy indexes (the Maintain/streaming lifecycle specs) never trip it
    Vectors.absorbIndex(dir, vecs(1000 until 1400), "vec_id", "embedding")
    // pin the ratio gate itself at spec scale by zeroing the floor
    // (a FRESH index: the one above already sits past 2x by design)
    spark.conf.set("spark.graft.absorb.staleFloorRows", "0")
    try {
      val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_stale2").toString
      Vectors.writeIndex(vecs(0 until 100), "vec_id", "embedding", k = 4, dir2)
      // 1.9x: absorb-without-retrain is the intended cheap path — no gate
      Vectors.absorbIndex(dir2, vecs(100 until 190), "vec_id", "embedding")
      // 2.1x: refused, naming the design point and the rebuild path
      val e = intercept[IllegalStateException] {
        Vectors.absorbIndex(dir2, vecs(190 until 210), "vec_id", "embedding")
      }
      assert(e.getMessage.contains("design point") &&
        e.getMessage.contains("built for 100"))
      // explicit override keeps appending at the frozen geometry
      spark.conf.set("spark.graft.absorb.allowStale", "true")
      try Vectors.absorbIndex(dir2, vecs(190 until 210), "vec_id", "embedding")
      finally spark.conf.unset("spark.graft.absorb.allowStale")
      // a pre-r17 index (no design-point stamp) absorbs unchecked
      val f = graft.sources.ArtifactStore.fs(dir2)
      f.delete(new org.apache.hadoop.fs.Path(dir2, "_graft_ann_meta.json"), false)
      Vectors.absorbIndex(dir2, vecs(300 until 310), "vec_id", "embedding")
    } finally spark.conf.unset("spark.graft.absorb.staleFloorRows")
  }

  test("IVF absorb torn-rebuild fence: stamped index without assignments _SUCCESS is refused (ADVICE r18)") {
    // writeIndex stamps BEFORE the assignments overwrite (documented
    // crash trade): a crash mid-rebuild leaves a fresh stamp over
    // assignments partially from the previous build. The absorb gate
    // must refuse that state, not gate and route against it.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_torn").toString
    val rnd = new scala.util.Random(13)
    def vecs(r: Range) = r.map(i => (i.toLong,
      Array.fill(4)((rnd.nextFloat() - 0.5f) * 2f))).toDF("vec_id", "embedding")
    Vectors.writeIndex(vecs(0 until 40), "vec_id", "embedding", k = 4, dir)
    val f = graft.sources.ArtifactStore.fs(dir)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/assignments/_SUCCESS")
    assert(f.exists(marker), "writeIndex should commit assignments with _SUCCESS")
    f.delete(marker, false)
    // the refusal is the TYPED torn fence (ADVICE r19: distinct from
    // the staleness gate's StaleIndexException, so a harness asserting
    // a gate trip can never mistake one refusal for the other)
    val e = intercept[graft.operators.TornIndexException] {
      Vectors.absorbIndex(dir, vecs(100 until 110), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("_SUCCESS") && e.getMessage.contains("rebuild"))
    // probes are fenced the same way (ADVICE r19: only absorbs were —
    // a probe against the torn dir returned silently wrong results)
    intercept[graft.operators.TornIndexException] {
      Vectors.ivfSearchIndexed(dir, vecs(0 until 40), "vec_id", "embedding",
        vecs(500 until 502).toDF("qid", "qv"), "qid", "qv", nprobe = 1, k = 1)
    }
    // ...and so is Maintain's ann-index compaction
    intercept[graft.operators.TornIndexException] {
      Maintain.maintainRoot(spark, dir, staleMs = 0L)
    }
    // a stamp RECORDING that its builder wrote no markers (has_marker
    // false) is served without one — the fence trusts the write-time
    // expectation, not the reader's conf (ADVICE r19: a marker-enabled
    // reader used to permanently refuse a legitimately marker-less
    // index)
    val m0 = Vectors.readAnnMeta(dir).get
    Vectors.writeAnnMeta(dir, m0.builtN, m0.k, m0.routeK, hasMarker = false)
    Vectors.absorbIndex(dir, vecs(100 until 110), "vec_id", "embedding")
    // restoring the marker (what a completed rebuild leaves) unblocks
    // the marker-expecting stamp too
    Vectors.writeAnnMeta(dir, m0.builtN, m0.k, m0.routeK, hasMarker = true)
    f.create(marker, true).close()
    Vectors.absorbIndex(dir, vecs(110 until 120), "vec_id", "embedding")
    // a pre-stamp index (no meta) stays fail-open even without the
    // marker — the documented pre-r17 compatibility behavior
    f.delete(new org.apache.hadoop.fs.Path(dir, "_graft_ann_meta.json"), false)
    f.delete(marker, false)
    Vectors.absorbIndex(dir, vecs(200 until 210), "vec_id", "embedding")
  }

  test("withBucketBound: pass-through under the cap, loud in-plan error on a hot bucket") {
    import graft.queries.LlmOps
    val frame = ((0 until 20).map(i => (i.toLong, "cool")) ++
      (100 until 110).map(i => (i.toLong, "hot"))).toDF("vec_id", "label")
    // under the cap: rows pass through bit-identically
    val guarded = Vectors.withBucketBound(frame, "label", maxRows = 25)
    assert(guarded.columns.toSeq == frame.columns.toSeq)
    assert(guarded.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      frame.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // a manufactured hot bucket (20 rows > cap 15) fails AT EXECUTION,
    // naming the bucket and its pair expansion — never silently quadratic
    val hot = Vectors.withBucketBound(frame, "label", maxRows = 15)
    val e = intercept[Exception] { hot.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val msg = messages(e).mkString("\n")
    assert(msg.contains("label=cool") && msg.contains("20 rows") &&
      msg.contains("190 pairs"), s"guard message unhelpful:\n$msg")
    // the catalog row composes the guard: a tiny session cap trips it on
    // the fixture, the default cap does not (oracle row unchanged)
    spark.conf.set("spark.graft.neardup.maxBucketRows", "3")
    try {
      val boom = intercept[Exception] {
        LlmOps.embeddingNeardup.run(spark, "/root/testdata/sf0.001").count()
      }
      assert(messages(boom).mkString.contains("exhaustive in-bucket pairing"))
    } finally spark.conf.unset("spark.graft.neardup.maxBucketRows")
    assert(LlmOps.embeddingNeardup.run(spark, "/root/testdata/sf0.001").count() > 0)
  }

  test("IVF skeleton: nearest-centroid assignment via broadcast argmin") {
    // 2 obvious clusters on the axes; centroids from the true means.
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.0f)),
      (3L, Array(0.1f, 1.0f)), (4L, Array(0.0f, 0.9f))).toDF("vec_id", "v")
    val cents = Seq((0, Array(1.0f, 0.05f)), (1, Array(0.05f, 1.0f))).toDF("cid", "c")
    val scored = vecs.crossJoin(broadcast(cents))
      .select($"vec_id", $"cid",
        Vectors.cosine(Vectors.dotScaled($"v", $"c"),
          Vectors.normScaled($"v"), Vectors.normScaled($"c")).as("cos_sim"))
    val assigned = Vectors.topKPerKey(scored, $"vec_id", $"cos_sim", $"cid", 1)
      .select($"vec_id", $"cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("ivfAssignRouted: routing degenerates to the flat argmax when cells cover all fines") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.1f)), (1L, Array(0.0f, 1.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.1f, 0.95f, 0.0f)),
      (4L, Array(0.95f, 0.05f, 0.1f)), (5L, Array(0.05f, 1.05f, 0.2f)))
      .toDF("vec_id", "embedding").repartition(3)
    val cents = Vectors.buildCentroids(vecs, "vec_id", "embedding", 2)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flat = asMap(Vectors.ivfAssign(vecs, "vec_id", "embedding", cents))
    // coarseK=1: one cell holds every fine; coarseK=2: top-2-of-2 puts
    // every fine in both cells — both reduce to the exact assignment
    // (the genuinely-routed regime, coarseK≥3, is pinned by the sf0.01
    // oracle gate at k=23/coarseK=5: the DuckDB twin replays the rule)
    for (ck <- Seq(1, 2))
      assert(asMap(Vectors.ivfAssignRouted(vecs, "vec_id", "embedding", cents, ck))
        == flat, s"routed(coarseK=$ck) diverged from the flat argmax")
  }

  test("arg_max_by: struct-ordering parity — tie → smallest id, NaN greatest, null ord skipped") {
    val df = Seq(
      (1L, 10, Option(0.5)), (1L, 3, Option(0.9)), (1L, 7, Option(0.9)), // tie → id 3
      (2L, 5, Option(Double.NaN)), (2L, 6, Option(1.0)),                 // NaN greatest → 5
      (4L, 1, Option.empty[Double]), (4L, 2, Option(0.3))                // null never wins
    ).toDF("g", "id", "c").repartition(3)
    val got = df.groupBy($"g")
      .agg(call_function("arg_max_by", $"id", $"c").as("id"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 5, 4L -> 2))
    // bit-parity with the struct-max form it replaces (same Spark
    // total float ordering), minus that form's SortAggregate plan
    val viaStruct = df.groupBy($"g")
      .agg(max(struct($"c", (-$"id").as("nid"))).as("m"))
      .select($"g", (-$"m.nid").cast("int").as("id"))
      .as[(Long, Int)].collect().toMap
    assert(got == viaStruct)
  }

  test("bandPairsCapped: split buckets pair exhaustively, tight clusters star to the min-id rep") {
    // band 0: one tight cluster of 8 rows (over cap 4 — the geometry
    // "failed to split" it) and one 3-row bucket (under cap); band 1:
    // a 2-row bucket that only collides through the Hamming-1 probe
    val keys = (
      (1L to 8L).map(i => (i, 0, 5L)) ++            // tight cluster, key 5
      Seq((20L, 0, 9L), (21L, 0, 9L), (22L, 0, 9L)) ++ // small bucket
      Seq((30L, 1, 2L), (31L, 1, 3L))               // Hamming-1 apart
    ).toDF("vec_id", "band", "band_key")
    val got = Vectors.bandPairsCapped(keys, Seq(0L, 1L, 2L), cap = 4L)
      .as[(Long, Long)].collect().toSet
    // tight cluster: ONLY stars (1,j) — no (2,3) etc.; small bucket:
    // all pairs; cross-bucket: (30,31) via the mask-1 probe
    val stars = (2L to 8L).map(j => (1L, j)).toSet
    val small = Set((20L, 21L), (20L, 22L), (21L, 22L))
    assert(got == stars ++ small + ((30L, 31L)),
      s"unexpected pair set: ${got -- (stars ++ small + ((30L, 31L)))} / missing ${(stars ++ small + ((30L, 31L))) -- got}")
    // the bound: pair count is linear in the tight cluster, not quadratic
    assert(got.count(_._1 == 1L) == 7)
  }

  test("bandPairsCapped: first-band emission = old distinct-of-multiset, bit-identical and duplicate-free") {
    // mixed-regime fixture: 4 bands, 3-bit keys from a deterministic
    // hash mix (cross-band multi-collisions guaranteed), one 41-member
    // clone block (over-cap in every band → star regime), a few
    // single-band rows (absent-band null handling in the profiles)
    val keys = (
      (for (vec <- 0L until 120L; band <- 0 until 4)
        yield (vec, band, ((vec * 2654435761L + band * 40503L) >>> 7) % 8)) ++
      (for (vec <- 200L until 241L; band <- 0 until 4)
        yield (vec, band, 3L)) ++
      (300L until 305L).map(v => (v, 2, (v % 8).max(0)))
    ).toDF("vec_id", "band", "band_key")
    val masks = graft.operators.AnnGeometry.probeMasks(3)
    for (cap <- Seq(5L, 10L, 64L)) {
      val got = Vectors.bandPairsCapped(keys, masks, cap)
        .as[(Long, Long)].collect()
      val want = Vectors.bandPairsCappedDistinct(keys, masks, cap)
        .as[(Long, Long)].collect().toSet
      assert(got.length == got.toSet.size,
        s"cap=$cap: first-band emission produced duplicates")
      assert(got.toSet == want,
        s"cap=$cap: extra=${(got.toSet -- want).take(5)} missing=${(want -- got.toSet).take(5)}")
    }
  }

  test("bandPairsCapped rep-only regime: mask-0 pairing intact, Hamming-1 via bucket reps only") {
    // band 0 only: bucket A = {10,11} (key 1), bucket B = {20,21}
    // (key 0) — Hamming-1 apart via mask 1; reps are 10 and 20
    val keys = Seq((10L, 0, 1L), (11L, 0, 1L), (20L, 0, 0L), (21L, 0, 0L))
      .toDF("vec_id", "band", "band_key")
    val masks = Seq(0L, 1L, 2L)
    def run(repOnly: Boolean, both: Boolean = false): Set[(Long, Long)] =
      Vectors.bandPairsCapped(keys, masks, cap = 8L, repOnlyProbes = repOnly,
          repBothOrientations = both)
        .as[(Long, Long)].collect().toSet
    val full = run(false)
    assert(full == Set((10L, 11L), (20L, 21L),
      (10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L)))
    val rep = run(true)
    // in-bucket (mask-0) pairs survive for every member; cross-bucket
    // discovery flows through rep 10's probe only — 11's Hamming pairs
    // are the (certified, bounded) misses of the default asymmetric form
    assert(rep == Set((10L, 11L), (20L, 21L), (10L, 20L), (10L, 21L)))
    assert(rep.subsetOf(full))
    // opt-in both-orientation emission (the measured-2x-verify knob):
    // rep 20's probe of bucket A now also lands 11 in reverse
    // (normalized to (11,20)); (11,21) stays missed — neither endpoint
    // is a rep whose probe reaches the other
    val repBoth = run(true, both = true)
    assert(repBoth == Set((10L, 11L), (20L, 21L),
      (10L, 20L), (10L, 21L), (11L, 20L)))
    assert(rep.subsetOf(repBoth) && repBoth.subsetOf(full))
  }

  test("bandPairsCapped rep-only: first-band emission = distinct-of-multiset twin, duplicate-free") {
    // same mixed-regime fixture as the full-probe differential: clone
    // block (star regime), hash-mixed multi-collisions, single-band rows
    val keys = (
      (for (vec <- 0L until 120L; band <- 0 until 4)
        yield (vec, band, ((vec * 2654435761L + band * 40503L) >>> 7) % 8)) ++
      (for (vec <- 200L until 241L; band <- 0 until 4)
        yield (vec, band, 3L)) ++
      (300L until 305L).map(v => (v, 2, (v % 8).max(0)))
    ).toDF("vec_id", "band", "band_key")
    val masks = graft.operators.AnnGeometry.probeMasks(3)
    for (cap <- Seq(5L, 10L, 64L); both <- Seq(false, true)) {
      val got = Vectors.bandPairsCapped(keys, masks, cap, repOnlyProbes = true,
        repBothOrientations = both).as[(Long, Long)].collect()
      val want = Vectors.bandPairsCappedDistinct(keys, masks, cap,
        repOnlyProbes = true, repBothOrientations = both)
        .as[(Long, Long)].collect().toSet
      assert(got.length == got.toSet.size,
        s"cap=$cap both=$both: rep-only first-band emission produced duplicates")
      assert(got.toSet == want,
        s"cap=$cap both=$both: extra=${(got.toSet -- want).take(5)} missing=${(want -- got.toSet).take(5)}")
      // and rep-only stays a subset of the full fan-out at every cap,
      // in both orientation modes
      val fullSet = Vectors.bandPairsCapped(keys, masks, cap)
        .as[(Long, Long)].collect().toSet
      assert(want.subsetOf(fullSet), s"cap=$cap both=$both: rep-only invented a pair")
    }
  }

  test("bandPairsCapped without mask 0: replay does not hallucinate the absent mask-0 channel (r19 review)") {
    // masks = {1, 2} only — no in-bucket pairing anywhere. Two vectors
    // share a small bucket at band 0 (NOT emitted: no mask-0 probes)
    // and collide via mask 1 at band 1 (the only real emission). A
    // replay that treats xu == 0 at band 0 as "already emitted" would
    // silence band 1 and drop the pair entirely.
    val keys = Seq((1L, 0, 3L), (2L, 0, 3L), (1L, 1, 4L), (2L, 1, 5L))
      .toDF("vec_id", "band", "band_key")
    val masks = Seq(1L, 2L)
    for (repOnly <- Seq(false, true); both <- Seq(false, true)) {
      val got = Vectors.bandPairsCapped(keys, masks, cap = 8L,
          repOnlyProbes = repOnly, repBothOrientations = both)
        .as[(Long, Long)].collect()
      val want = Vectors.bandPairsCappedDistinct(keys, masks, cap = 8L,
        repOnlyProbes = repOnly, repBothOrientations = both)
        .as[(Long, Long)].collect().toSet
      assert(got.toSet == want && got.length == got.toSet.size,
        s"repOnly=$repOnly both=$both: got=${got.toSeq} want=$want")
      assert(want == Set((1L, 2L)), s"fixture expectation drifted: $want")
    }
  }

  test("bandPairsCapped both-orientation replay: over-cap-bucket rep forward-probing a small bucket, re-colliding later, emits once (ADVICE r18)") {
    // band 0: bucket key5 = {1,2,3} (n=3 > cap=2, rep 1), key4 = {10}
    // (n=1). Rep 1 forward-probes mask 1 into 10's small bucket →
    // (1,10) emitted at band 0 even though 1's OWN bucket is over cap.
    // band 1: 1 and 10 share small bucket key7 → mask-0 collision. A
    // replay that required BOTH endpoints' buckets <= cap did not
    // recognize the band-0 emission (nU = 3 > cap) and re-emitted the
    // pair at band 1 — breaking exactly-once-per-band.
    val keys = Seq((1L, 0, 5L), (2L, 0, 5L), (3L, 0, 5L), (10L, 0, 4L),
        (1L, 1, 7L), (10L, 1, 7L), (2L, 1, 1L), (3L, 1, 2L))
      .toDF("vec_id", "band", "band_key")
    val masks = Seq(0L, 1L, 2L, 4L)
    val got = Vectors.bandPairsCapped(keys, masks, cap = 2L,
        repOnlyProbes = true, repBothOrientations = true)
      .as[(Long, Long)].collect()
    assert(got.count(_ == ((1L, 10L))) == 1,
      s"(1,10) must be emitted exactly once, got ${got.toSeq}")
    assert(got.length == got.toSet.size,
      s"duplicate pair rows: ${got.toSeq}")
    val want = Vectors.bandPairsCappedDistinct(keys, masks, cap = 2L,
      repOnlyProbes = true, repBothOrientations = true)
      .as[(Long, Long)].collect().toSet
    assert(got.toSet == want,
      s"extra=${got.toSet -- want} missing=${want -- got.toSet}")
  }

  test("semdedup_ann star + rep-only regimes: measured recall on an over-cap clone corpus") {
    import graft.queries.LlmOps
    // ADVICE r16: the sf0.01 recall fixture sits entirely in the
    // small-bucket regime (max bucket 51), so a star-regime recall
    // collapse had no measured pin. This corpus has a 100-clone family
    // (over DedupTargetBucketRows=64 in every band → irreducible
    // bucket → star path) plus 20 moderate near-dup pairs and 180
    // background vectors (small-bucket + Hamming-1 regimes).
    val rnd = new scala.util.Random(17)
    val dim = 8
    def vec(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = vec()
    val rows =
      (0 until 100).map(i => (i.toLong,
        base.map(x => x + (rnd.nextDouble() * 2e-4 - 1e-4).toFloat), 0)) ++
      (0 until 20).flatMap { p =>
        val v = vec()
        val w = v.map(x => x + (rnd.nextDouble() * 0.04 - 0.02).toFloat)
        Seq((100L + 2 * p, v, 1), (101L + 2 * p, w, 1))
      } ++
      (0 until 180).map(i => (200L + i.toLong, vec(), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_starfix_").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def droppedOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter($"dropped").select($"vec_id").collect().map(_.getLong(0)).toSet
    val exact = droppedOf(LlmOps.semDedup.run(spark, dir))
    val full = droppedOf(LlmOps.semDedupAnnFrame(spark, dir))
    val rep = droppedOf(LlmOps.semDedupAnnFrame(spark, dir, Some(true)))
    assert(exact.nonEmpty)
    // certified subset in BOTH regimes; rep-only pairs ⊆ full pairs
    assert(full.subsetOf(exact), s"ann invented drops: ${(full -- exact).take(5)}")
    assert(rep.subsetOf(full), s"rep-only invented drops: ${(rep -- full).take(5)}")
    // the star path must land the clone-family verdicts: every clone
    // but the min-id representative drops, in both regimes
    val cloneDrops = (1L to 99L).toSet
    assert(cloneDrops.subsetOf(full), s"star regime missed ${(cloneDrops -- full).take(5)}")
    assert(cloneDrops.subsetOf(rep), s"rep-only star missed ${(cloneDrops -- rep).take(5)}")
    val fullRecall = full.size.toDouble / exact.size
    val repRecall = rep.size.toDouble / exact.size
    info(f"star-corpus recall: full=$fullRecall%.3f rep-only=$repRecall%.3f (${exact.size} exhaustive drops)")
    // measured on this fixture: full 0.997, rep-only 0.976 — floors sit
    // under them the way the sf0.01 pin (0.889 measured, 0.8 floor) does
    assert(fullRecall >= 0.9, f"full-fanout recall collapsed: $fullRecall%.2f")
    assert(repRecall >= 0.85, f"rep-only recall collapsed: $repRecall%.2f")
  }

  test("semdedup_ann: certified subset of the exhaustive verdicts, recall measured") {
    import graft.queries.LlmOps
    // the ANN-candidate scale path may MISS drops (LSH recall < 1) but
    // must never invent one: both forms share clusters and the verdict
    // rule, so every ann-dropped id must be exhaustively-dropped too
    val d = "/root/testdata/sf0.01"
    def droppedOf(q: graft.queries.Q): Set[Long] =
      q.run(spark, d).filter($"dropped").select($"vec_id")
        .collect().map(_.getLong(0)).toSet
    val exact = droppedOf(LlmOps.semDedup)
    val ann = droppedOf(LlmOps.semDedupAnn)
    assert(exact.nonEmpty, "fixture lost its semantic near-dups")
    assert(ann.subsetOf(exact),
      s"ann invented drops: ${(ann -- exact).take(5)}")
    val recall = ann.size.toDouble / exact.size
    info(f"semdedup_ann recall on sf0.01: $recall%.3f (${ann.size}/${exact.size})")
    // fixture-measured: 0.889 with 16-plane/4-band collisions +
    // Hamming-1 multi-probe (0.476 without the probes); floor alerts if
    // geometry or hashing drifts
    assert(recall >= 0.8, f"semdedup_ann recall collapsed: $recall%.2f")
  }
}
