package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Benchmark main (driver contract): times every headline catalog query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement rules (VERDICT r01 findings 1/2/6):
  *  - fixed catalog order, so run-to-run diffs are query diffs;
  *  - a warmup pass at a tiny SF first, so JVM/codegen warmup isn't billed
  *    to whichever query runs first;
  *  - results go to a `noop`-format write — the full plan executes
  *    (projections, sorts, joins) with zero sink cost; a bare `count()`
  *    would let Catalyst strip projections and final sorts;
  *  - per-query failures are REPORTED (driver-visible -1 timing on
  *    stdout, message in bench_full.json's `errors` map, nonzero exit),
  *    never swallowed into a plausible total;
  *  - EVERY rep's time is recorded (`reps` map in `bench_full.json`), not
  *    just the min — the round-over-round question "did this query really
  *    regress, or is the box noisy?" needs the spread, not a point estimate;
  *  - a regression gate: history is the committed `bench_full.json`
  *    when its `sf` matches and it is not a subset record (exact
  *    3-decimal values + `calib_sec`), else the newest PARSEABLE prior
  *    `BENCH_r{N}.json` (driver format, stdout line embedded in its
  *    `tail` field). When both sides carry a calib stamp, prior times
  *    are scaled by curCalib/prevCalib first (host-speed swings are not
  *    regressions; the applied `calib_ratio` is recorded). Any per-query
  *    delta beyond 1.5× in either direction is reported in `deltas` —
  *    with the current spread attached, so a "regression" whose
  *    previous time sits inside today's rep spread reads as noise, not code;
  *  - the stdout line stays COMPACT (2-decimal minima, no reps/deltas): the
  *    driver keeps only the last 2000 chars of output, and an over-long
  *    line gets its head truncated away (the round-5 failure). The full
  *    record — 3-decimal minima, rep spreads, deltas — is written to
  *    `bench_full.json` in SPARK_GRAFT_BENCH_DIR and committed with the
  *    repo so the history survives in parseable form;
  *  - the VERY LAST line is a SHORT total-only record (VERDICT r08
  *    finding 1): the per-query line above it grows with the catalog and
  *    will eventually overflow ANY tail capture, so the total must not
  *    ride on it — a ~120-char closing line keeps the headline number
  *    parseable at every catalog size, with `bench_full.json` as the
  *    pointer to the per-query detail;
  *  - reps are INTERLEAVED round-robin across queries (VERDICT r08 item
  *    8): a box-contention window then contaminates one rep of many
  *    queries — survivable by best-of-N — instead of every rep of a few,
  *    which is unrecoverable;
  *  - a contamination gate (VERDICT r08 finding 1): a query whose best
  *    rep is >10× its parseable-history time while that history is
  *    sub-second has no code-level mechanism for the regression (those
  *    plans are single-stage scans/joins) — it is re-run once after the
  *    main pass, and if still >10× the record carries an explicit
  *    `contaminated` marker in `bench_full.json` instead of standing as
  *    a silent 7.6× "regression" (the round-8 failure: 271 s recorded,
  *    34 s real).
  */
object Bench {

  /** Best-effort read of prior rounds' per-query seconds from `dir`.
    *
    * Walks `BENCH_r*.json` files newest-first and returns the FIRST one
    * that yields a parseable `{"metric":...}` line WITH a per-query map
    * (the driver file wraps our stdout inside a 2000-char `tail` string,
    * which can truncate the line's head — such files are skipped, not
    * treated as "no prior data"). Lines are scanned newest-last-first
    * within a file because the final line is now the short total-only
    * record, which carries no `queries` map — the per-query line sits
    * just above it. Queries recorded as errored (negative seconds) are
    * dropped so the regression gate never compares against a -1 sentinel.
    * When `sfDir` is given, a line carrying a DIFFERENT `sf` is skipped —
    * a local sf0.01 iteration run with the default bench dir must not
    * gate against the driver's sf0.1 history (a line whose sf was
    * truncated away is accepted: driver records are sf0.1 and the field
    * sits at the line's tail, the end that survives head-truncation —
    * bounded by the `knownQueries` sanity check: when provided, an
    * sf-less record must share at least half its query names with the
    * current catalog, so a head-truncated record from some OTHER corpus
    * or an ancient catalog generation can't serve as gate history). */
  def previousBench(dir: String,
      sfDir: Option[String] = None,
      knownQueries: Set[String] = Set.empty): Option[(Int, Map[String, Double])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rx = """BENCH_r(\d+)\.json""".r
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case rx(n) => Some((n.toInt, f))
        case _     => None
      })
      .sortBy(-_._1)
    files.iterator.flatMap { case (n, f) =>
      try {
        val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val outer = JsonMethods.parse(raw)
        val tail = outer \ "tail" match {
          case JString(s) => s
          case _          => raw // tolerate a bare stdout line saved as the file
        }
        val lines = tail.linesIterator.map(_.trim.stripPrefix("[info] ").trim)
          .filter(l => l.startsWith("{") && l.contains("\"metric\""))
          // last line first: records through r20 closed with the short
          // total-only line (no queries map — skipped by the match
          // below); from r21 the per-query line itself is last. Either
          // way the newest line WITH a queries map wins.
          .toSeq.reverse
        lines.iterator.flatMap { l =>
          try {
            val j = JsonMethods.parse(l)
            // sfAbsent means "the record carries no readable sf field",
            // independent of whether a filter was requested — a
            // well-formed sf must never trip the knownQueries sanity
            // check below (ADVICE r11).
            val sfAbsent = !(j \ "sf").isInstanceOf[JString]
            val sfOk = (j \ "sf", sfDir) match {
              case (JString(s), Some(want)) => s == want
              case _                        => true // truncated sf, or no filter
            }
            if (!sfOk) None
            else j \ "queries" match {
              case JObject(fields) =>
                val qs = fields.collect { case (k, JDouble(v)) => k -> v }
                  .concat(fields.collect { case (k, JInt(v)) => k -> v.toDouble })
                  .filter(_._2 >= 0).toMap
                // sanity bound for sf-less (head-truncated) records: at
                // least half the recorded names must be current catalog
                // queries, else the record is from a different world
                val known = !sfAbsent || knownQueries.isEmpty ||
                  qs.keys.count(knownQueries.contains) * 2 >= qs.size
                if (qs.isEmpty || !known) None else Some((n, qs))
              case _ => None
            }
          } catch { case _: Throwable => None }
        }.nextOption()
      } catch { case _: Throwable => None }
    }.nextOption()
  }
  /** Full-precision history: the committed `bench_full.json` is LAST
    * round's record until this run overwrites it at the end, carrying
    * exact 3-decimal per-query seconds plus the box-speed `calib_sec`
    * stamp — a strictly better regression baseline than the driver's
    * 2000-char tail capture (which degrades to integer precision at
    * catalog size). Used only when its `sf` matches this run's and it
    * is NOT a `subset` record (a narrowed probe must never serve as
    * full-catalog history). Returns (per-query seconds, calib stamp). */
  def previousFull(dir: String,
      sfDir: String): Option[(Map[String, Double], Option[Double])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try {
      val f = new java.io.File(dir, "bench_full.json")
      if (!f.isFile) None
      else {
        val j = JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        val sfOk = j \ "sf" match { case JString(s) => s == sfDir; case _ => false }
        val subset = (j \ "subset") != JNothing
        if (!sfOk || subset) None
        else j \ "queries" match {
          case JObject(fields) =>
            val qs = fields.collect { case (k, JDouble(v)) => k -> v }
              .concat(fields.collect { case (k, JInt(v)) => k -> v.toDouble })
              .filter(_._2 >= 0).toMap
            val calib = j \ "calib_sec" match {
              case JDouble(v) if v > 0 => Some(v)
              case _                   => None
            }
            if (qs.isEmpty) None else Some((qs, calib))
          case _ => None
        }
      }
    } catch { case _: Throwable => None }
  }

  /** The stdout per-query contract line (extracted for BenchSpec).
    * See the call site for the round-21 layout rationale: `queries`
    * sorted ASCENDING by seconds with `value`/`sf` at the line's END
    * (what survives the driver's head-truncating 2000-char tail capture
    * is the expensive rows + the headline), and the precision fallback
    * is MIXED (1 decimal below 10 s, integer above) instead of the old
    * all-integer floor that blinded PERF_r20's per-query table. */
  private[graft] def contractLine(results: Seq[(String, Double)],
      total: Double, recordFile: String, sfDir: String): String = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def qJsonSorted(fmt: Double => String): String =
      results.sortBy { case (k, v) => (v, k) }
        .map { case (k, v) => s"${jstr(k)}:${fmt(v)}" }
        .mkString("{", ",", "}")
    def stdoutLine(fmt: Double => String): String =
      s"""{"metric":"total","unit":"sec","detail":"$recordFile","queries":${qJsonSorted(
          fmt)},"value":$total,"sf":"$sfDir"}"""
    def trim1(v: Double): String = {
      val r = math.rint(v * 10) / 10
      if (r == math.rint(r)) r.toLong.toString else r.toString
    }
    val two = stdoutLine(v => (math.rint(v * 100) / 100).toString)
    if (two.length <= 1850) two
    else stdoutLine(v => if (v < 10) trim1(v) else math.rint(v).toLong.toString)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default shuffle partitions = cores (the committed-record setting).
    // SPARK_GRAFT_SHUFFLE overrides for scale experiments: a local box
    // emulates a big cluster's per-task memory share by raising the
    // partition count (sort-agg spill is per-partition rows × row width;
    // a 1000-executor cluster runs the same plan at 100× the partition
    // count). Records taken with an override are still stamped subset.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(q: queries.Q, dir: String): Option[String] =
      try {
        q.run(spark, dir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }

    // SPARK_GRAFT_ONLY=a,b,c narrows the catalog for targeted scale
    // probes (e.g. re-measuring one query's decade ratio at sf10
    // without paying the full catalog). Local investigation only — the
    // driver never sets it — and a narrowed run is stamped `subset` in
    // bench_full.json so it can never pass as a full-catalog record.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = {
      val all = SparkEntry.catalog.filter(_.headline)
      only.fold(all)(o => all.filter(q => o(q.name)))
    }
    // ADVICE r10: a typo'd or empty SPARK_GRAFT_ONLY must fail fast, not
    // silently run nothing and write a "0 of N" subset record
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.catalog.map(_.name).toSet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the catalog: ${unknown.toSeq.sorted.mkString(", ")}")
      require(qs.nonEmpty,
        "SPARK_GRAFT_ONLY selected zero headline queries")
    }
    // narrowed runs record to their own file (ADVICE r10) — see below
    val recordFile = if (only.isEmpty) "bench_full.json" else "bench_subset.json"
    qs.foreach(exec(_, warmDir)) // warmup: codegen + JIT per query shape

    // box-speed calibration stamp: a fixed data-independent codegen
    // workload (range→sum, no I/O, no shuffle) timed after warmup. Round
    // 9→10 the VM landed on ~2.2×-slower hardware and EVERY query moved
    // together — absolute cross-round deltas were box noise, and the only
    // way to see that was a side experiment. With `calib_sec` in every
    // record, a delta reader divides the two stamps first and argues
    // about plans, not hosts. (Best of 3, same policy as the queries.)
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    // best-of-N per query: box noise is additive, so the minimum is the
    // least-contaminated estimate of the plan's real cost; all reps are
    // kept for the spread. Reps are INTERLEAVED round-robin across
    // queries (rep 1 of every query, then rep 2, ...): a box-contention
    // window then contaminates one rep of MANY queries — survivable by
    // best-of-N — instead of every rep of a few, which is unrecoverable.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // SPARK_GRAFT_METRICS=timed (VERDICT r16 #3): capture task-level
    // shuffle/spill bytes DURING each timed rep via the scoped listener,
    // instead of the separate metrics pass below — for disk-ceiling
    // campaigns (the r16 sf1000 semdedup_ann record landed its timed rep
    // but the best-effort metrics RE-RUN blew the scratch budget, so the
    // record shipped without byte maps). The listener adds its
    // end-of-body drain to each rep, so the mode is opt-in and the
    // record carries a "metrics_mode":"timed" stamp; bytes recorded are
    // the MIN-TIME successful rep's (the same rep the headline reports).
    val metricsMode = sys.env.getOrElse("SPARK_GRAFT_METRICS", "1")
    val timed = collection.mutable.Map.empty[String, Vector[(Double, Option[String])]]
    val timedBytes =
      collection.mutable.Map.empty[String, Vector[(Double, graft.plans.PlanMetrics.Bytes)]]
    def runOnce(q: queries.Q): Unit = {
      if (metricsMode == "timed") {
        // the scoped listener's end-of-body quiescence drain (≥150 ms,
        // bounded 10 s) is measurement plumbing, not query cost — time
        // the execution INSIDE the measured body so timed-mode minima
        // stay comparable with non-timed records (ADVICE r17: the drain
        // used to sit inside the rep window and bias headline minima
        // high; every task the exec ran has completed when exec returns,
        // so the listener still sees the full byte totals)
        var t = 0.0
        val (err, b) = graft.plans.PlanMetrics.measureTasks(spark) {
          val t0 = System.nanoTime()
          val e = exec(q, sfDir)
          t = (System.nanoTime() - t0) / 1e9
          e
        }
        timed(q.name) = timed.getOrElse(q.name, Vector.empty) :+ ((t, err))
        if (err.isEmpty)
          timedBytes(q.name) = timedBytes.getOrElse(q.name, Vector.empty) :+ ((t, b))
      } else {
        val t0 = System.nanoTime()
        val err = exec(q, sfDir)
        val t = (System.nanoTime() - t0) / 1e9
        timed(q.name) = timed.getOrElse(q.name, Vector.empty) :+ ((t, err))
      }
    }
    for (_ <- 1 to reps; q <- qs) runOnce(q)

    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", ".")
    // a pointed-at directory that does not exist yet must not cost the
    // run its detailed record (reps/shuffle/spill maps) at the very end
    new java.io.File(benchDir).mkdirs()
    // history preference: the committed full-precision record first
    // (exact values + calib stamp), the driver's tail capture as the
    // fallback. When BOTH this run and the history carry a calib stamp,
    // prior times are scaled by curCalib/prevCalib before any gate
    // compares them — the round-10 lesson: the host's effective speed
    // moved 1.6× between runs of identical code, and without the
    // normalization every such swing reads as a catalog-wide
    // regression (or improvement) that never happened.
    val fullHist = previousFull(benchDir, sfDir)
    val tailHist = previousBench(benchDir, Some(sfDir), qs.map(_.name).toSet)
    val prevQueries: Map[String, Double] =
      fullHist.map(_._1).orElse(tailHist.map(_._2)).getOrElse(Map.empty)
    val calibRatio: Option[Double] =
      fullHist.flatMap(_._2).map(pc => calib / pc)
    def adj(p: Double): Double = calibRatio.fold(p)(p * _)
    val prevTag: Option[String] =
      if (fullHist.isDefined) Some("\"bench_full\"")
      else tailHist.map(_._1.toString)

    // contamination gate (VERDICT r08/r09): a query whose best rep is
    // >10× its parseable-history time while that history is sub-second
    // has no code-level mechanism for the regression (those plans are
    // single-stage scans/joins) — re-run it ONCE after the main pass
    // (the contention window that produced the outlier has usually
    // passed); if the extra rep is still >10× history, the record
    // carries the query in an explicit `contaminated` list instead of
    // standing as a silent "regression" (the round-8 failure: 271 s
    // recorded for code that really ran in 34 s).
    // NOTE the max(·, 1 s) floor: parseable history may come from an
    // integer-precision stdout line, where every sub-second query rounds
    // to 0 — a bare `> h*10` would then flag the entire catalog (and
    // re-run it all). A contaminated sub-second row must itself clear
    // the box's 1 s noise floor to count as an anomaly.
    val contaminated = collection.mutable.Buffer.empty[String]
    qs.foreach { q =>
      val ok = timed(q.name).filter(_._2.isEmpty).map(_._1)
      prevQueries.get(q.name).map(adj).foreach { h =>
        val bar = math.max(h * 10, 1.0)
        if (h < 1.0 && ok.nonEmpty && ok.min > bar) {
          runOnce(q)
          val ok2 = timed(q.name).filter(_._2.isEmpty).map(_._1)
          if (ok2.nonEmpty && ok2.min > bar) contaminated += q.name
        }
      }
    }

    val results = qs.map { q =>
      val runs = timed(q.name)
      val ok = runs.filter(_._2.isEmpty).map(_._1)
      if (ok.nonEmpty) (q.name, ok.min, ok, None)
      else (q.name, -1.0, Nil, runs.head._2)
    }

    // Shuffle/spill byte metrics, measured AFTER (and outside) the timed
    // reps so the timing contract is untouched: one extra execution per
    // query through PlanMetrics' synchronous accumulator read. These are
    // the scale-design numbers PERF.md's decade tables argue from —
    // shuffle growing super-linearly, or spill appearing between two SFs,
    // is the 100 TB warning timing alone can't give. Skipped via
    // SPARK_GRAFT_METRICS=0 (and for errored queries).
    val wantMetrics = metricsMode != "0" && metricsMode != "timed"
    // Storage left behind by a completed execution (cached frames,
    // localCheckpoint blocks from iterative operators) is dead weight for
    // every execution that follows in this JVM, but the ContextCleaner
    // frees it only when GC collects the owning references — which a big
    // heap defers long enough that the round-14 sf1000 dup_clusters
    // metrics pass OOM'd on blocks its own timed rep no longer needed.
    // Drop it all eagerly between executions: every re-execution builds
    // its plan fresh from the catalog, so nothing dropped here is ever
    // read again.
    def dropStorage(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // Two meters per query: the executed-plan read (comparable across
    // every prior round's record) and a scoped task-level listener that
    // ALSO counts jobs driven during DataFrame construction — the
    // iterative operators (dup_clusters' connected-components rounds)
    // whose shuffles the plan read reports as 0 (the r15 sf1000
    // campaign's empty dup_clusters byte maps).
    val measured: Map[String, (graft.plans.PlanMetrics.Bytes,
        graft.plans.PlanMetrics.Bytes)] =
      if (!wantMetrics) Map.empty
      else qs.flatMap { q =>
        // a fatal executor failure (e.g. an OOM at a scale experiment)
        // can STOP the context mid-pass; the per-query catch below can't
        // help then — addSparkListener on a dead context throws and the
        // whole record (timed reps included) used to be lost (the r15
        // sf1000 ivf-family run). Record what was measured and move on.
        if (spark.sparkContext.isStopped) None
        else scala.util.Try {
          dropStorage()
          val (planB, taskB) = graft.plans.PlanMetrics.measureTasks(spark) {
            try Some(graft.plans.PlanMetrics.measure(q.run(spark, sfDir)))
            catch { case _: Throwable => None }
          }
          planB.map(b => q.name -> (b, taskB))
        }.toOption.flatten
      }.toMap
    val planBytes: Map[String, graft.plans.PlanMetrics.Bytes] =
      measured.view.mapValues(_._1).toMap
    // task-level totals, recorded only where they materially exceed the
    // plan read (>20 % and >100 MB) — i.e. where construction-time jobs
    // would otherwise go unmeasured
    val taskBytes: Map[String, graft.plans.PlanMetrics.Bytes] =
      if (metricsMode == "timed")
        // timed mode: every query's task-level bytes from its min-time
        // successful rep (the rep the headline minimum reports)
        timedBytes.view.mapValues(v => v.minBy(_._1)._2).toMap
      else measured.collect {
        case (k, (p, t))
            if (t.shuffleWrite > p.shuffleWrite * 1.2 &&
              t.shuffleWrite - p.shuffleWrite > (100L << 20)) ||
              (t.spill > p.spill * 1.2 && t.spill - p.spill > (100L << 20)) =>
          k -> t
      }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    def r2(v: Double): Double = math.rint(v * 100) / 100

    // The driver records only the LAST 2000 chars of this process's output
    // (BENCH_r*.json "tail"), so the stdout line must stay comfortably
    // under that or its head — metric, value, and the first queries — is
    // truncated away (this is exactly what made BENCH_r05 unparseable).
    // Stdout therefore carries the compact contract line only (2-decimal
    // minima); the per-rep spreads, errors, and the regression-gate deltas
    // go to bench_full.json next to the BENCH_r*.json history.
    def qJsonAt(fmt: Double => String): String =
      results.map { case (k, v, _, _) => s"${jstr(k)}:${fmt(v)}" }.mkString("{", ",", "}")
    val repJson = results.map { case (k, _, rs, _) =>
      s"${jstr(k)}:${rs.map(r3).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
    val errJson = if (errs.isEmpty) "" else s""","errors":${errs.mkString("{", ",", "}")}"""
    // regression gate vs the newest PARSEABLE prior round: flag >1.5×
    // moves in either direction, IGNORING queries under 1 s on both
    // sides — the box's demonstrated noise floor: with no code change,
    // explode_words ran 0.16 s (r5) → 0.80 s (r6) → 0.14 s (r7), and
    // filter_null / id_extract bounced the same way (VERDICT r06 item 7).
    // Sub-second rows are catalog-order/JIT noise on this box; real
    // regressions of consequence clear 1 s. The current spread rides
    // along so a flagged move can be judged against it.
    val noiseFloorSec = 1.0
    val deltaJson =
      if (prevQueries.isEmpty) ""
      else {
        val flagged = results.flatMap { case (k, cur, rs, _) =>
          prevQueries.get(k).map(adj).collect {
            case p if cur > 0 && math.max(p, cur) > noiseFloorSec &&
                (cur > p * 1.5 || p > cur * 1.5) =>
              s"${jstr(k)}:{${jstr("prev")}:${r3(p)},${jstr("cur")}:${r3(cur)}," +
                s"${jstr("reps")}:${rs.map(r3).mkString("[", ",", "]")}}"
          }
        }
        val ratioJson =
          calibRatio.fold("")(r => s""","calib_ratio":${r3(r)}""")
        s""","prev":${prevTag.get}$ratioJson,"deltas":${flagged.mkString("{", ",", "}")}"""
      }
    val total = r2(results.collect { case (_, v, _, _) if v >= 0 => v }.sum)
    // 1-minute load average at end of run: a headline number taken on a
    // busy box (load >> core count) is noise, not a regression — this
    // stamp lets the next round's delta reader check before arguing
    val load = r2(java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage)
    // ADVICE r06: the stdout line carries NO error strings (errored
    // queries surface as -1 timings here; messages live in
    // bench_full.json), so its length is bounded by query count alone.
    //
    // Measurement-bug fix, round 21 (VERDICT r20 next-round #2): the old
    // terminal fallback degraded the whole map to INTEGER seconds once
    // the 1-decimal line exceeded 1850 chars — which a 120-row catalog
    // always does (the query NAMES alone are ~2000 chars, so NO
    // precision fits the driver's 2000-char tail capture) — and that
    // left PERF_r20 with nothing but 1.0/2.0 rounding artifacts and a
    // garbage scaling block. The driver demonstrably parses the FULL
    // stdout line, not just the tail it archives (BENCH_r20.parsed
    // carries every query, including the ~22 rows its head-truncated
    // tail lost), so the fix is to stop destroying precision the parser
    // can use: the fallback is now MIXED precision (1 decimal below
    // 10 s — every current row; integers above, where a tenth is noise)
    // with whole values trimmed of the ".0" tail. For any tail-only
    // reader the line is additionally ordered so what survives
    // head-truncation is what matters most: the `queries` map is sorted
    // ASCENDING by seconds (the expensive rows sit nearest the end) and
    // the headline `value`/`sf` fields come AFTER the map, at the
    // guaranteed-surviving end of the line. Field order is irrelevant
    // to any JSON parser (previousBench included); bench_full.json
    // keeps full 3-decimal precision in catalog order as before.
    val line = contractLine(
      results.map { case (k, v, _, _) => (k, v) }, total, recordFile, sfDir)
    val contamJson =
      if (contaminated.isEmpty) ""
      else s""","contaminated":${contaminated.map(jstr).mkString("[", ",", "]")}"""
    val subsetJson =
      if (only.isEmpty) ""
      else s""","subset":"${qs.length} of ${SparkEntry.catalog.count(_.headline)}""""
    // per-query shuffle-write and spill MB (bench_full.json only — the
    // stdout contract line must not grow with extra per-query maps)
    def mb(b: Long): Double = math.rint(b / 1048.576) / 1000 // 3-decimal MB
    val metricsJson =
      if (planBytes.isEmpty && taskBytes.isEmpty) ""
      else {
        val sh = results.flatMap { case (k, _, _, _) =>
          planBytes.get(k).map(b => s"${jstr(k)}:${mb(b.shuffleWrite)}")
        }.mkString("{", ",", "}")
        val spills = results.flatMap { case (k, _, _, _) =>
          planBytes.get(k).filter(_.spill > 0).map(b => s"${jstr(k)}:${mb(b.spill)}")
        }
        val spJson = if (spills.isEmpty) "" else s""","spill_mb":${spills.mkString("{", ",", "}")}"""
        // task-level totals for queries whose construction-time jobs the
        // plan read missed (see taskBytes above): "all" = every task the
        // query's execution ran, iterations included
        val shAll = results.flatMap { case (k, _, _, _) =>
          taskBytes.get(k).map(b => s"${jstr(k)}:${mb(b.shuffleWrite)}")
        }
        val spAll = results.flatMap { case (k, _, _, _) =>
          taskBytes.get(k).filter(_.spill > 0).map(b => s"${jstr(k)}:${mb(b.spill)}")
        }
        val allJson =
          (if (shAll.isEmpty) ""
           else s""","shuffle_all_mb":${shAll.mkString("{", ",", "}")}""") +
            (if (spAll.isEmpty) ""
             else s""","spill_all_mb":${spAll.mkString("{", ",", "}")}""")
        val modeJson =
          if (metricsMode == "timed") s""","metrics_mode":"timed"""" else ""
        val planJson = if (planBytes.isEmpty) "" else s""","shuffle_mb":$sh$spJson"""
        s"$planJson$allJson$modeJson"
      }
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","load_avg":$load,"calib_sec":${r3(
          calib)},"queries":${qJsonAt(
          v => r3(v).toString)},"reps":$repJson$errJson$deltaJson$contamJson$subsetJson$metricsJson,"sf":"$sfDir"}"""
    // ADVICE r10: a narrowed run writes its record to bench_subset.json —
    // never over the committed full-catalog baseline, whose full
    // precision + calib stamp the next full run gates against (the
    // subset stamp already prevented MIS-gating, but clobbering the
    // best baseline degraded the next gate to tail-capture precision)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(benchDir, recordFile),
      fullJson.getBytes("UTF-8"))
    catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] could not write $recordFile: $e")
    }
    spark.stop()
    // Both records go out after Spark shutdown (so no chatter lands
    // between them). Round 21 ORDER SWAP (VERDICT r20 next-round #2):
    // the per-query contract line is now the VERY LAST line, so the
    // driver's 2000-char tail capture is spent on ITS tail (≈85 of the
    // 120 rows, plus the value/sf fields deliberately placed at the
    // line's end) instead of on a second line. The SHORT total-only
    // record (VERDICT r08/r09 finding 1 — a headline number that stays
    // parseable at every catalog size) is kept, printed FIRST: up there
    // it costs the capture nothing (it self-truncates before the
    // per-query line does) while any full-stdout scanner still gets a
    // guaranteed-complete total line.
    println(s"""{"metric":"total","value":$total,"unit":"sec","detail":"$recordFile","sf":"$sfDir"}""")
    println(line)
    if (results.exists(_._4.nonEmpty)) sys.exit(1)
  }
}
