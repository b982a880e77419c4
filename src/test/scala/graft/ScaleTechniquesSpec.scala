package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** The two shuffle-shaping techniques the 100 TB design leans on:
  * salting (hot keys) and bucketing (co-located joins with no exchange). */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

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

    def maxTaskShuffleRead(body: => Unit): Long = {
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

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    // force the shuffled join (no broadcast escape hatch), turn off AQE's
    // skew splitting — it is the built-in fallback for sort-merge skew;
    // THIS test isolates what explicit salting buys when AQE can't
    // re-plan (see Skew scaladoc) — and turn off partition coalescing,
    // which at this tiny data size would merge every reducer into one
    // task and hide the distribution entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
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
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
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
}
