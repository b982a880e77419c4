package graft

import java.nio.file.Files
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.sinks.Writers

/** Sink semantics: hive layout, leftover persistence/re-drive, object
  * delete, running counters. */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("K2: partitionedByDate writes hive year=/month=/day= directories") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq(
      (1L, Timestamp.valueOf("2025-07-28 12:00:00")),
      (2L, Timestamp.valueOf("2025-07-29 01:00:00")),
      (3L, Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("id", "ts")
    Writers.partitionedByDate(df, "ts", dir, maxRecordsPerFile = 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/year=2025/month=07/day=28")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/year=2024/month=01/day=02")))
    // partition pruning: only the 2025 files are read
    val pruned = back.filter($"year" === 2025)
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // K6 analog: the job commit protocol (staging + atomic rename) leaves
    // no partial state behind — readers never see a half-written batch
    assert(!Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.contains("staging")))
  }

  test("K2 incremental: a second batch overwrites only ITS partitions") {
    val dir = Files.createTempDirectory("graft_sink_inc").toString
    val b1 = Seq((1L, Timestamp.valueOf("2025-07-28 12:00:00"))).toDF("id", "ts")
    val b2 = Seq((2L, Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("id", "ts")
    Writers.partitionedByDate(b1, "ts", dir)
    Writers.partitionedByDate(b2, "ts", dir)
    // static overwrite would have truncated the 2025 partition
    assert(spark.read.parquet(dir).count() == 2)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/year=2025/month=07/day=28")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/year=2024/month=01/day=02")))
  }

  test("K8: leftover persistence, re-drive shrinks, drained deletes (K5)") {
    val dir = Files.createTempDirectory("graft_left").toString + "/leftovers"
    Writers.saveLeftovers(Seq("NA1_1", "NA1_2", "NA1_3").toDF("matchId"), dir)
    val processed1 = Seq("NA1_2").toDF("matchId")
    val rem1 = Writers.remainingLeftovers(spark, dir, processed1, "matchId")
    assert(rem1.as[String].collect().toSet == Set("NA1_1", "NA1_3"))
    // overwrite-with-tail (write to a NEW path then swap — parquet reads
    // are lazy, overwriting the path being read would race)
    val dir2 = dir + "_tail"
    Writers.saveLeftovers(rem1, dir2)
    val processed2 = Seq("NA1_1", "NA1_3").toDF("matchId")
    val rem2 = Writers.remainingLeftovers(spark, dir2, processed2, "matchId")
    assert(rem2.isEmpty)
    // drained → delete the object (K5)
    assert(Writers.deletePath(spark, dir))
    assert(!Files.exists(java.nio.file.Paths.get(dir)))
  }

  test("A6: running counters via Observation (games_processed / no_data analog)") {
    val obs = Observation("etl_metrics")
    val df = Seq(("m1", true), ("m2", false), ("m3", true)).toDF("matchId", "hasData")
      .observe(obs,
        count(lit(1)).as("games_processed"),
        sum(when($"hasData", 0).otherwise(1)).as("no_data"))
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("games_processed") == 3L)
    assert(m("no_data") == 1L)
  }
}
