package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.driver.{Pipeline, Windows}

/** End-to-end pipeline over the LoL fixtures: the full §3.2 Lambda ETL
  * chain, composed, against real nested documents. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("matchEtl: participants → wide player_data rows, reference layout") {
    val out = Pipeline.matchEtl(readLol("match.json"))
    assert(out.count() == 3) // 2 + 1 participants
    val cols = out.columns.toSet
    // enrichment + identity columns
    assert(Set("matchId", "gameCreation", "gameVersion", "mapId", "source",
      "championName", "puuid", "win", "kills").subsetOf(cols))
    // perks unnest + prefix strip + blacklist
    assert(cols.contains("Primary_slot_1_perk") && cols.contains("Secondary_style"))
    assert(cols.contains("kda") && cols.contains("playerScore0"))
    assert(cols.contains("challenges_deep")) // replace-first kept one prefix
    assert(!out.columns.exists(_.contains("legendaryItemUsed")))
    assert(!cols.contains("perks"))
    val ahri = out.filter($"championName" === "Ahri").head()
    assert(ahri.getAs[String]("matchId") == "NA1_5200190036")
    assert(ahri.getAs[Long]("Primary_slot_1_perk") == 8112L)
    assert(ahri.getAs[Double]("kda") == 3.5)
  }

  test("timelineEtl: frames × participantFrames with hoist and puuid join") {
    val out = Pipeline.timelineEtl(readLol("timeline.json"))
    assert(out.count() == 6) // 2 frames × 3 participants
    val cols = out.columns.toSet
    assert(Set("matchId", "participantId", "puuid", "timestamp", "currentGold",
      "abilityPower", "armor", "totalDamageDone", "position_x").subsetOf(cols))
    val r = out.filter($"participantId" === 10 && $"timestamp" === 60000).head()
    assert(r.getAs[String]("puuid") == "p-010")
    assert(r.getAs[Long]("currentGold") == 610L)
  }

  test("matchEtl/timelineEtl: empty batch lands zero rows, no crash") {
    assert(Pipeline.matchEtl(readLol("match.json").filter(lit(false))).count() == 0)
    assert(Pipeline.timelineEtl(readLol("timeline.json").filter(lit(false))).count() == 0)
  }

  test("playerMapEtl: puuid map → ranked rows") {
    val out = Pipeline.playerMapEtl(readLol("player_map.json"))
    assert(out.count() == 3)
    assert(out.filter($"puuid" === "p-003").select("leaguePoints")
      .head().getLong(0) == 1201L)
  }

  test("run: full batch lands partitioned outputs and advances the window") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    val state = s"$dir/state.json"
    val day = 24 * 3600L
    val now = 1754000000L
    def fx(n: String) = TestSpark.fixture(n)
    // bootstrap (now-6d, now-4d) → processed window [now-4d, now-2d),
    // covering both fixture matches (gameCreation 2025-07-28/29 12:00)
    val w = Pipeline.run(spark, fx("match.json"), fx("timeline.json"),
      fx("player_map.json"), s"$dir/out", state, now,
      Windows.WindowState(now - 6 * day, now - 4 * day))
    assert(w.isDefined)
    // player_data partitioned by gameCreation event date (2025-07-28/29)
    val players = spark.read.parquet(s"$dir/out/player_data")
    assert(players.count() == 3)
    assert(players.select("year").distinct().as[Int].collect().toSet == Set(2025))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/out/player_data/year=2025/month=07/day=28")))
    assert(spark.read.parquet(s"$dir/out/timeline_data").count() == 6)
    assert(spark.read.json(s"$dir/out/player_ranks_data").count() == 3)
    // state advanced and persisted
    assert(graft.sinks.Writers.readState(state).exists(_._1 == now - 4 * day))
  }

  test("run: the processed window FILTERS the batch, not just cadences it") {
    val dir = Files.createTempDirectory("graft_pipe_w").toString
    val day = 24 * 3600L
    val now = 1754000000L
    def fx(n: String) = TestSpark.fixture(n)
    // bootstrap (now-7d, now-5d) → window [now-5d, now-3d): covers ONLY
    // NA1_5200190036 (07-28 12:00); 037 (07-29 12:00) is out-of-window
    val w = Pipeline.run(spark, fx("match.json"), fx("timeline.json"),
      fx("player_map.json"), s"$dir/out", s"$dir/state.json", now,
      Windows.WindowState(now - 7 * day, now - 5 * day))
    assert(w.isDefined)
    val players = spark.read.parquet(s"$dir/out/player_data")
    assert(players.count() == 2) // only match 036's two participants
    assert(players.select("matchId").distinct().as[String].collect().toSet ==
      Set("NA1_5200190036"))
    // timeline semi-join keeps only windowed matchIds (036 IS the fixture)
    assert(spark.read.parquet(s"$dir/out/timeline_data").count() == 6)
  }

  test("pipeline ETL plans have no single-task stage (no coalesce/repartition(1))") {
    Seq(Pipeline.matchEtl(readLol("match.json")),
      Pipeline.timelineEtl(readLol("timeline.json")),
      Pipeline.playerMapEtl(readLol("player_map.json"))).foreach { df =>
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("Repartition 1"), s"single-task stage in plan:\n$p")
    }
  }
}
