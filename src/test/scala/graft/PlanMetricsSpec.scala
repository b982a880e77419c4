package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanMetrics

/** Pins [[PlanMetrics]] — the executed-plan shuffle/spill byte reader the
  * bench's `shuffle_mb`/`spill_mb` record and PERF.md's decade evidence
  * stand on. If these numbers silently read zero, the scale tables lie. */
class PlanMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("a groupBy measures real shuffle bytes; a pure scan measures zero") {
    val df = spark.range(100000).select(
      (col("id") % 97).as("k"), col("id").as("v"))
    val agg = PlanMetrics.measure(df.groupBy("k").sum("v"))
    assert(agg.shuffleWrite > 0, "aggregation exchange invisible to PlanMetrics")
    val scan = PlanMetrics.measure(df.select(col("v") * 2))
    assert(scan.shuffleWrite == 0, s"scan-only plan claims ${scan.shuffleWrite} shuffle bytes")
  }

  test("AQE final plans and shuffled joins are descended into") {
    // two shuffle exchanges (one per join side under a merge/shuffled-hash
    // join) — the reader must find them inside AQE's materialized stages
    val left = spark.range(50000).select(col("id").as("k"), lit("x").as("a"))
    val right = spark.range(50000).select(col("id").as("k"), lit("y").as("b"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = PlanMetrics.measure(left.join(right, "k"))
      val single = PlanMetrics.measure(left.groupBy("k").count())
      assert(j.shuffleWrite > single.shuffleWrite,
        "join plan should shuffle both sides; did the reader miss a query stage?")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("wide-payload distinct shuffles an order of magnitude more than hash dedup") {
    // the dedup vs dedup_hash design argument, measured: full rows as
    // grouping keys vs (hash, id) pairs + semi join-back. The frame goes
    // through parquet first, as the real tables do — built straight from
    // range(), the unique `id` grouping key lets the planner satisfy the
    // distinct's distribution with Range's own partitioning and the
    // exchange legitimately disappears (a good plan, a useless fixture).
    // shuffleBytesWritten is post-compression, so the payload must carry
    // entropy — a constant filler lz4-compresses into parity with the
    // 32 B hashes and the comparison says nothing
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    val rnd = new scala.util.Random(7)
    val payloads = (0 until 500).map(i =>
      f"p-$i%03d-" + rnd.alphanumeric.take(4000).mkString)
    spark.createDataFrame((0 until 2000).map(i => (i.toLong, payloads(i % 500))))
      .toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    val full = PlanMetrics.measure(wide.distinct())
    val keepers = wide.groupBy(sha2($"text", 256).as("h"))
      .agg(min($"id").as("id")).select($"id")
    val hashed = PlanMetrics.measure(wide.join(keepers, Seq("id"), "left_semi"))
    assert(full.shuffleWrite > hashed.shuffleWrite * 5,
      s"expected wide distinct (${full.shuffleWrite} B) >> hash dedup (${hashed.shuffleWrite} B)")
  }

  test("forced operator spill is visible in spill bytes") {
    // WindowExec buffers each partition-key group in an in-memory array
    // and only consults the spill threshold once the group outgrows
    // `in.memory.threshold` and hands off to the external sorter — both
    // must be tiny to force the disk path deterministically
    val keys = Seq("spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.set(_, "10"))
      val df = spark.range(10000).select((col("id") % 7).as("k"), col("id").as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("v")
        .rowsBetween(Long.MinValue, 0)
      val b = PlanMetrics.measure(df.select(sum("v").over(w).as("s")))
      assert(b.spill > 0, "forced window spill not measured")
    } finally prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("measureTasks counts construction-time jobs the plan read misses") {
    // the dup_clusters shape in miniature: an eager shuffling job runs
    // while the frame is CONSTRUCTED (here: a localCheckpoint of an
    // aggregate, as the connected-components rounds do), then the
    // returned frame itself is narrow. The executed-plan read sees only
    // the final narrow plan (shuffle 0); the task-level listener must
    // see the construction shuffle too.
    val df = spark.range(100000).select((col("id") % 1013).as("k"), col("id").as("v"))
    val (planB, taskB) = PlanMetrics.measureTasks(spark) {
      val landed = df.groupBy("k").sum("v").localCheckpoint()
      PlanMetrics.measure(landed.select((col("k") * 2).as("k2")))
    }
    assert(planB.shuffleWrite == 0,
      s"fixture broke: final plan should be narrow, saw ${planB.shuffleWrite} B")
    assert(taskB.shuffleWrite > 0,
      "construction-time shuffle invisible to the task listener")
  }

  test("measureJobs attributes bytes to the job that paid them, by description") {
    // two labeled actions: one shuffling aggregate, one narrow scan. The
    // per-job rows must carry the driver-set descriptions, the aggregate
    // job must own all the shuffle bytes, and the per-job sum must agree
    // with the whole-body measureTasks view (same listener discipline).
    val sc = spark.sparkContext
    val df = spark.range(100000).select((col("id") % 1013).as("k"), col("id").as("v"))
    val (_, jobs) = PlanMetrics.measureJobs(spark) {
      sc.setJobDescription("spec:agg")
      df.groupBy("k").sum("v").localCheckpoint()
      sc.setJobDescription("spec:narrow")
      try df.select(col("v") * 2).foreach(_ => ()) finally sc.setJobDescription(null)
    }
    val byDesc = jobs.groupBy(_.desc)
    assert(byDesc.contains("spec:agg") && byDesc.contains("spec:narrow"),
      s"descriptions lost: ${jobs.map(j => s"${j.jobId}:${j.desc}").mkString(", ")}")
    val aggBytes = byDesc("spec:agg").map(_.bytes.shuffleWrite).sum
    val narrowBytes = byDesc("spec:narrow").map(_.bytes.shuffleWrite).sum
    assert(aggBytes > 0, "aggregate job's shuffle not attributed")
    assert(narrowBytes == 0, s"narrow job claims $narrowBytes shuffle bytes")
    assert(jobs.forall(_.tasks > 0), "job rows with zero tasks recorded")
  }
}
