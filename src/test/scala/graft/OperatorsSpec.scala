package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Normalize, VerticalSplit}

/** VerticalSplit / Normalize / league+player-map explode semantics. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeEventTs: all three ts generations land on the same instants") {
    // the on-disk fixture only exercises one generation at a time, so pin
    // the dispatch here: long nanos (legacy fixtures via nanosAsLong),
    // TIMESTAMP_NTZ wall-clock (current timestamp[us] fixtures, session
    // tz UTC), and an already-instant timestamp must all normalize to
    // the identical micros-precision instant
    val nanos = 1722470400123456789L // 2024-08-01T00:00:00.123456789Z
    val fromLong = graft.sources.Tables.normalizeEventTs(
      Seq(nanos).toDF("ts"))
    val fromNtz = graft.sources.Tables.normalizeEventTs(
      Seq(nanos / 1000).toDF("us")
        .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts")))
    val fromTs = graft.sources.Tables.normalizeEventTs(
      Seq(nanos / 1000).toDF("us").select(timestamp_micros($"us").as("ts")))
    val vals = Seq(fromLong, fromNtz, fromTs).map { df =>
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      df.select($"ts".cast("long")).as[Long].head() ->
        df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    }
    assert(vals.distinct.size == 1, s"generations disagree: $vals")
    assert(vals.head._2 == "2024-08-01 00:00:00.123456")
  }

  test("split assigns each column to the FIRST matching group; rejoin restores the row") {
    val df = Seq((1, "k", 10, 20.0, "x")).toDF("id", "key", "perks_a", "challenges_b", "other")
    val parts = VerticalSplit.split(df, Seq("id", "key"), Seq(
      "perks" -> ((c: String) => c.startsWith("perks")),
      "challenges" -> ((c: String) => c.startsWith("challenges"))))
    assert(parts("perks").columns.toSeq == Seq("id", "key", "perks_a"))
    assert(parts("challenges").columns.toSeq == Seq("id", "key", "challenges_b"))
    assert(parts("rest").columns.toSeq == Seq("id", "key", "other"))
    val back = VerticalSplit.rejoin(
      Seq(parts("perks"), parts("challenges"), parts("rest")), Seq("id", "key"))
    assert(back.select("id", "key", "perks_a", "challenges_b", "other").head() ==
      Row(1, "k", 10, 20.0, "x"))
  }

  test("P7/L4: tier broadcast onto exploded league entries + union of tiers") {
    val league = readLol("league.json")
    val entries = league.select($"tier", explode($"entries").as("e"))
      .select($"e.*", $"tier")
    assert(entries.count() == 3)
    assert(entries.filter($"tier" === "CHALLENGER").count() == 2)
    // P3: rename rank→player_rank + stamp time_stamp
    val stamped = Normalize.stampTimestamp(entries, 1753700000L)
    assert(stamped.columns.contains("player_rank"))
    assert(!stamped.columns.contains("rank"))
    assert(stamped.select("time_stamp").distinct().as[Long].head() == 1753700000L)
  }

  test("E7: player-map document (struct of puuids) explodes to rows") {
    val pm = readLol("player_map.json")
    val mapped = Normalize.structToMap(
      struct(pm.columns.map(c => col(c).as(c)): _*),
      pm.schema)
    val rows = pm.select(explode(mapped).as(Seq("puuid", "stats")))
      .select($"puuid", $"stats.*")
    assert(rows.count() == 3)
    val p2 = rows.filter($"puuid" === "p-002").head()
    assert(p2.getAs[String]("tier") == "GRANDMASTER")
    assert(p2.getAs[Long]("leaguePoints") == 744L)
  }

  test("J4: ranks ⨝ player-map linkage on shared puuid") {
    val league = readLol("league.json")
    val entries = league.select($"tier", explode($"entries").as("e"))
      .select($"e.puuid".as("puuid"), $"e.leaguePoints".as("lp"), $"tier")
    val pm = readLol("player_map.json")
    val players = pm.select(explode(Normalize.structToMap(
        struct(pm.columns.map(col): _*), pm.schema)).as(Seq("puuid", "stats")))
      .select($"puuid", $"stats.wins".as("wins"))
    val linked = entries.join(players, "puuid")
    assert(linked.count() == 3)
    assert(linked.filter($"puuid" === "p-001").select("wins").head().getLong(0) == 300L)
  }

  test("stripPrefixes strips only the first occurrence and only one prefix") {
    val df = Seq((1, 2, 3, 4)).toDF("challenges_kda", "missions_x",
      "challenges_challenges_y", "plain")
    val out = Normalize.stripPrefixes(df, Seq("challenges_", "missions_"))
    assert(out.columns.toSeq == Seq("kda", "x", "challenges_y", "plain"))
  }

  test("S4: paginated scan unions pages until the first empty one") {
    val pages = Map(
      1 -> Seq(("p-1", 100L), ("p-2", 90L)),
      2 -> Seq(("p-3", 80L)),
      3 -> Seq.empty[(String, Long)],
      4 -> Seq(("p-9", 1L))) // never reached: stop at first empty page
    val out = graft.sources.Paginate.scan(p =>
      pages.get(p).map(rows => rows.toDF("puuid", "lp")))
    assert(out.isDefined)
    assert(out.get.count() == 3)
    assert(!out.get.as[(String, Long)].collect().map(_._1).contains("p-9"))
    assert(graft.sources.Paginate.scan(_ => None).isEmpty)
  }

  test("HLL extension: approx_count_distinct within 5% on a known cardinality") {
    // SURVEY §2.6: no HLL in the reference; Catalyst provides it if we
    // extend — sketch-based distinct is the 100 TB answer where exact
    // distinct's shuffle is unaffordable.
    val df = spark.range(100000).select(($"id" % 9876).as("k"))
    val approx = df.select(approx_count_distinct($"k")).head().getLong(0)
    assert(math.abs(approx - 9876.0) / 9876.0 < 0.05)
  }

  test("S2: route_file routes by the TABLE ROOT component, not part-file names (multi-file table)") {
    // the same documents table written as 3 part files — input_file_name
    // now ends in part-*.parquet; routing must still extract the
    // `documents…` directory component and land document_store
    val tmp = java.nio.file.Files.createTempDirectory("graft_route_multi").toString
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val parts = new java.io.File(s"$tmp/documents.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"fixture landed $parts part files; need 2+")
    val routed = SparkEntry.queries("route_file")(spark, tmp)
    assert(routed.count() > 0)
    assert(routed.select("object_name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("documents.parquet"))
    assert(routed.select("route").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("document_store"))
  }

  test("alignTo null-pads to the target order (align_row_data)") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = Normalize.alignTo(df, Seq(
      ("name", org.apache.spark.sql.types.StringType),
      ("score", org.apache.spark.sql.types.DoubleType),
      ("id", org.apache.spark.sql.types.IntegerType)))
    assert(out.columns.toSeq == Seq("name", "score", "id"))
    assert(out.head() == Row("a", null, 1))
  }
}
