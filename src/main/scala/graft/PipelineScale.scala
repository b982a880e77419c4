package graft

import org.apache.spark.sql.SparkSession

/** Composed-pipeline SCALE record (dev main, the `Bench`/`Explain`
  * sibling): amplify the spec's LoL JSON fixtures to N matches + N
  * timelines and run [[graft.driver.Pipeline.run]] — the whole §3.2
  * container (route → explode/flatten/enrich → windowed partitioned
  * land → read-back semi-join → snapshot), not per-operator rows — once
  * at a decade the PipelineSpec fixtures never reach.
  *
  * Fixture amplification: each match/timeline is the spec template with
  * a distinct matchId and a gameCreation spread across one day (all
  * inside the run's window, so the window filter passes everything —
  * the worst case for the landing write). Files are JSON ARRAYS (the
  * `multiLine` shape `Pipeline.run` reads — the reference stores one
  * document per S3 object; an array file is the batched equivalent),
  * `files` of them so the parse parallelism is explicit.
  *
  * Prints one JSON line: n, gen/run wall seconds, landed row counts.
  */
object PipelineScale {

  private val BaseEpochMs = 1753704000000L // the fixture's gameCreation day

  // one match document, %d = match ordinal (also reused in the id);
  // two participants so player_data = 2 rows/match like the fixture
  private val MatchT =
    """{"metadata":{"dataVersion":"2","matchId":"NA1_%d"},"info":{
      |"gameCreation":%d,"gameDuration":1820,"gameVersion":"15.14.x","mapId":11,
      |"participants":[
      |{"puuid":"p-001","championName":"Ahri","win":true,"kills":7,"goldEarned":12000,
      |"challenges":{"kda":3.5,"legendaryItemUsed":[3089,3157],"challenges_deep":1},
      |"missions":{"playerScore0":4},
      |"perks":{"statPerks":{"defense":5002,"flex":5008,"offense":5005},
      |"styles":[{"style":8100,"selections":[{"perk":8112},{"perk":8126},{"perk":8138},{"perk":8135}]},
      |{"style":8300,"selections":[{"perk":8345},{"perk":8347}]}]}},
      |{"puuid":"p-002","championName":"Garen","win":false,"kills":2,"goldEarned":9000,
      |"challenges":{"kda":0.8,"legendaryItemUsed":[3071],"challenges_deep":2},
      |"missions":{"playerScore0":1},
      |"perks":{"statPerks":{"defense":5001,"flex":5002,"offense":5008},
      |"styles":[{"style":8400,"selections":[{"perk":8437},{"perk":8446},{"perk":8429},{"perk":8451}]},
      |{"style":8000,"selections":[{"perk":9101},{"perk":8017}]}]}}]},
      |"source":"prod"}""".stripMargin.replace("\n", "")

  // one timeline document, %d = the SAME match ordinal (semi-join key)
  private val TimelineT =
    """{"metadata":{"matchId":"NA1_%d"},"info":{
      |"endOfGameResult":"GameComplete","frameInterval":60000,
      |"participants":[{"participantId":1,"puuid":"p-001"},{"participantId":2,"puuid":"p-002"}],
      |"frames":[
      |{"timestamp":60000,
      |"events":[{"type":"CHAMPION_KILL","timestamp":61500,"realTimestamp":1753704061500},
      |{"type":"ITEM_PURCHASED","timestamp":62000,"realTimestamp":1753704062000}],
      |"participantFrames":{
      |"1":{"championStats":{"abilityPower":0,"armor":30},"damageStats":{"totalDamageDone":500},"position":{"x":560,"y":581},"currentGold":500,"level":1,"xp":0},
      |"2":{"championStats":{"abilityPower":10,"armor":28},"damageStats":{"totalDamageDone":450},"position":{"x":14000,"y":14000},"currentGold":500,"level":1,"xp":0}}},
      |{"timestamp":120000,
      |"events":[{"type":"SKILL_LEVEL_UP","timestamp":121000,"realTimestamp":1753704121000}],
      |"participantFrames":{
      |"1":{"championStats":{"abilityPower":20,"armor":33},"damageStats":{"totalDamageDone":1500},"position":{"x":800,"y":900},"currentGold":750,"level":2,"xp":280},
      |"2":{"championStats":{"abilityPower":10,"armor":30},"damageStats":{"totalDamageDone":1100},"position":{"x":13500,"y":13600},"currentGold":700,"level":2,"xp":260}}}]}}"""
      .stripMargin.replace("\n", "")

  private val PlayerMap =
    """{"p-001":{"tier":"CHALLENGER","player_rank":"I","leaguePoints":1543,"wins":300,"losses":250,"time_stamp":1753700000},
      |"p-002":{"tier":"GRANDMASTER","player_rank":"I","leaguePoints":744,"wins":150,"losses":140,"time_stamp":1753700000}}"""
      .stripMargin.replace("\n", "")

  /** Write `n` docs from `template` as `files` JSON-array text files. */
  private def amplify(spark: SparkSession, template: String, n: Long,
      files: Int, dir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.range(0, n)
      .repartition(files)
      .select(format_string(template, col("id"),
        // spread gameCreation across the day; harmless extra arg for the
        // timeline template (Formatter ignores surplus arguments)
        (lit(BaseEpochMs) + pmod(col("id") * 61231L, lit(86400000L))).as("ts")).as("j"))
      .as[String]
      .mapPartitions { it =>
        var first = true
        val body = it.map { s =>
          val out = if (first) s else "," + s
          first = false
          out
        }
        Iterator("[") ++ body ++ Iterator("]")
      }
      .write.mode("overwrite").text(dir)
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_pipe_scale")
    val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val files = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    amplify(spark, MatchT, n, files, s"$work/matches")
    amplify(spark, TimelineT, n, files, s"$work/timelines")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(work))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$work/player_map.json"), PlayerMap)
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    // the processed window is [bootstrap.end, bootstrap.end + step):
    // end the bootstrap AT the data's day so one NormalStepSec (2-day)
    // window covers the whole spread, and set the clock past its end
    val w = graft.driver.Pipeline.run(spark,
      s"$work/matches", s"$work/timelines", s"$work/player_map.json",
      s"$work/out", s"$work/state",
      nowEpoch = (BaseEpochMs / 1000) + graft.driver.Windows.NormalStepSec,
      bootstrap = graft.driver.Windows.WindowState(
        BaseEpochMs / 1000 - graft.driver.Windows.NormalStepSec,
        BaseEpochMs / 1000))
    val tRun = (System.nanoTime() - t1) / 1e9

    val players = spark.read.parquet(s"$work/out/player_data").count()
    val timelines = spark.read.parquet(s"$work/out/timeline_data").count()
    println(s"""{"metric":"pipeline_scale","n":$n,"files":$files,""" +
      s""""gen_sec":${math.round(tGen * 100) / 100.0},""" +
      s""""run_sec":${math.round(tRun * 100) / 100.0},""" +
      s""""player_rows":$players,"timeline_rows":$timelines,""" +
      s""""advanced":${w.isDefined}}""")
    spark.stop()
  }
}
