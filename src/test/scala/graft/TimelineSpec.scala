package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Evolve, Normalize}

/** Timeline ETL semantics (`Lambda/lambda_function.py:110-202`): frame/event
  * explodes, participantFrames map coercion + explode (intended vs the
  * reference's last-frame-only dedent bug), puuid lookup join, heterogeneous
  * event append. */
class TimelineSpec extends SparkSpec {
  import spark.implicits._

  private def timeline = readLol("timeline.json")

  test("E2: frames.events flatten concatenates all frames' events in order") {
    val ev = timeline.select(
      $"metadata.matchId".as("matchId"),
      explode(flatten($"info.frames.events")).as("e"))
      .select($"matchId", $"e.type".as("type"), $"e.timestamp".as("ts"))
    assert(ev.count() == 3)
    assert(ev.select("type").as[String].collect().toSeq ==
      Seq("CHAMPION_KILL", "ITEM_PURCHASED", "SKILL_LEVEL_UP"))
  }

  test("E3 intended: every frame's participantFrames explode (struct→map coercion)") {
    val frames = timeline.select($"metadata.matchId".as("matchId"),
      explode($"info.frames").as("f"))
    val pfType = frames.schema("f").dataType.asInstanceOf[StructType]("participantFrames")
      .dataType.asInstanceOf[StructType]
    val rows = frames.select($"matchId", $"f.timestamp".as("ts"),
      explode(Normalize.structToMap($"f.participantFrames", pfType))
        .as(Seq("participantId", "pf")))
      .select($"matchId", $"ts", $"participantId",
        $"pf.currentGold".as("currentGold"),
        $"pf.championStats.armor".as("armor"),
        $"pf.position.x".as("position_x"))
    assert(rows.count() == 6) // 2 frames × 3 participants
    val f1p10 = rows.filter($"ts" === 60000 && $"participantId" === "10").head()
    assert(f1p10.getAs[Long]("currentGold") == 610L)
    assert(f1p10.getAs[Long]("armor") == 20L)
  }

  test("E3 faithful: reference dedent bug keeps only the LAST frame") {
    // `lambda_function.py:145` loops participantFrames OUTSIDE the frames
    // loop → only frames[-1] is emitted, stamped with its timestamp.
    val last = timeline.select($"metadata.matchId".as("matchId"),
      element_at($"info.frames", -1).as("f"))
    val pfType = last.schema("f").dataType.asInstanceOf[StructType]("participantFrames")
      .dataType.asInstanceOf[StructType]
    val rows = last.select($"matchId", $"f.timestamp".as("ts"),
      explode(Normalize.structToMap($"f.participantFrames", pfType))
        .as(Seq("participantId", "pf")))
    assert(rows.count() == 3) // 1 frame × 3 participants
    assert(rows.select("ts").distinct().as[Long].head() == 120000L)
  }

  test("E6: participantId→puuid broadcast lookup join") {
    val participants = timeline.select(explode($"info.participants").as("p"))
      .select($"p.participantId".as("participantId"), $"p.puuid".as("puuid"))
    val frames = timeline.select(explode($"info.frames").as("f"))
    val pfType = frames.schema("f").dataType.asInstanceOf[StructType]("participantFrames")
      .dataType.asInstanceOf[StructType]
    val pfRows = frames.select($"f.timestamp".as("ts"),
      explode(Normalize.structToMap($"f.participantFrames", pfType))
        .as(Seq("pid", "pf")))
    val joined = pfRows
      .join(broadcast(participants),
        pfRows("pid").cast("long") === participants("participantId"))
    assert(joined.count() == 6)
    assert(joined.filter($"pid" === "10").select("puuid").distinct()
      .as[String].head() == "p-010")
  }

  test("E8: heterogeneous append widens schema across differently-shaped rows") {
    val events = timeline.select(explode(flatten($"info.frames.events")).as("e"))
      .select($"e.type".as("type"), $"e.timestamp".as("timestamp"))
    val scalars = timeline.select(
      $"info.endOfGameResult".as("endOfGameResult"),
      $"info.frameInterval".as("frameInterval"),
      $"metadata.matchId".as("matchId"))
    val out = Evolve.unionEvolve(Seq(events, scalars))
    assert(out.columns.toSeq ==
      Seq("type", "timestamp", "endOfGameResult", "frameInterval", "matchId"))
    assert(out.count() == 4) // 3 events + 1 scalar row
    assert(out.filter($"matchId".isNotNull).count() == 1)
  }
}
