package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import graft.sources.Tables
import graft.operators.{Flatten, Normalize}

/** Nested-document ETL catalog — the reference's defining capability
  * (SURVEY §2.3 P1/P2, §2.4 E1-E7): BFS flatten with blacklist, positional
  * perk unnest, participant/frame/map explodes, prefix renames.
  *
  * The driver's DuckDB oracle reads only the fixed parquet tables, so each
  * query CONSTRUCTS genuinely nested columns (struct/array/map) from table
  * columns, runs the real operator, and the oracle states the expected flat
  * result directly. The LoL-shaped fixtures (`src/test/resources/lol/`)
  * cover the same operators over the reference's true document shapes in
  * ScalaTest (FIXTURES.md family A).
  *
  * Scale: every query here is a single narrow scan→project/generate — no
  * shuffle, no driver loops; `Flatten.stats` adds one bounded aggregation
  * job when arrays/maps are present (see Flatten scaladoc).
  */
object Nested {

  /** P1 `flatten_json` (`Utils/json.py:3-33`): BFS flatten of a 3-level
    * document with `_`-joined paths, a variable-length array (split of the
    * segment name → max-length stat + null padding), a dynamic-key map
    * (segment→acctbal → key-union stat), and a blacklisted leaf
    * (`playerAugment*`, dropped). */
  val flatten = Q("flatten", (s, d) => {
    import s.implicits._
    val doc = Tables.customer(s, d).select(
      $"c_custkey",
      struct(
        $"c_name".as("name"),
        struct($"c_acctbal".as("acctbal"), $"c_mktsegment".as("segment")).as("account"),
        split($"c_mktsegment", "A").as("tags"),
        map($"c_mktsegment", $"c_acctbal").as("pref"),
        struct($"c_nationkey".as("playerAugmentId")).as("aug")).as("profile"))
    Flatten.flatten(doc)
  }, Some("""
    SELECT c_custkey,
      c_name AS profile_name,
      c_acctbal AS profile_account_acctbal,
      c_mktsegment AS profile_account_segment,
      string_split(c_mktsegment, 'A')[1] AS profile_tags_0,
      string_split(c_mktsegment, 'A')[2] AS profile_tags_1,
      CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END AS "profile_pref_AUTOMOBILE",
      CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END AS "profile_pref_BUILDING",
      CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END AS "profile_pref_FURNITURE",
      CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END AS "profile_pref_HOUSEHOLD",
      CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END AS "profile_pref_MACHINERY"
    FROM customer ORDER BY c_custkey"""),
    sortCols = Seq("c_custkey"))

  /** E4 `flatten_perks` (`Utils/json.py:35-54`): positional unnest of the
    * two rune styles (4 primary / 2 secondary selections) into
    * `Primary_slot_{i}_perk` / `*_style` + hoisted `statPerks`. */
  val flattenPerks = Q("flatten_perks", (s, d) => {
    import s.implicits._
    val sel = (c: org.apache.spark.sql.Column) => struct(c.cast("long").as("perk"))
    val p = Tables.part(s, d).select(
      $"p_partkey",
      struct(
        array(
          struct(lit(8100L).as("style"),
            array(sel($"p_partkey"), sel($"p_size"), sel($"p_partkey" + $"p_size"),
              sel($"p_size" * 2)).as("selections")),
          struct(lit(8300L).as("style"),
            array(sel($"p_partkey" % 100), sel($"p_size" + 1)).as("selections"))).as("styles"),
        struct($"p_size".cast("long").as("defense"), lit(5008L).as("flex"),
          ($"p_partkey" % 7).as("offense")).as("statPerks")).as("perks"))
    val perksType = p.schema("perks").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    p.select(($"p_partkey" +: Flatten.flattenPerksColumns($"perks", perksType, (4, 2))): _*)
  }, Some("""
    SELECT p_partkey,
      p_partkey AS "Primary_slot_1_perk",
      CAST(p_size AS BIGINT) AS "Primary_slot_2_perk",
      p_partkey + p_size AS "Primary_slot_3_perk",
      CAST(p_size * 2 AS BIGINT) AS "Primary_slot_4_perk",
      CAST(8100 AS BIGINT) AS "Primary_style",
      p_partkey % 100 AS "Secondary_slot_1_perk",
      CAST(p_size + 1 AS BIGINT) AS "Secondary_slot_2_perk",
      CAST(8300 AS BIGINT) AS "Secondary_style",
      CAST(p_size AS BIGINT) AS "statPerks_defense",
      CAST(5008 AS BIGINT) AS "statPerks_flex",
      p_partkey % 7 AS "statPerks_offense"
    FROM part ORDER BY p_partkey"""),
    sortCols = Seq("p_partkey"))

  /** E1 participants explode + P6 match-level enrichment
    * (`lambda_function.py:221-258`): match doc → one row per participant,
    * stamped with parent-level columns. */
  val explodeParticipants = Q("explode_participants", (s, d) => {
    import s.implicits._
    val docs = Tables.orders(s, d).select(
      $"o_orderkey",
      struct($"o_orderpriority".as("priority"), $"o_orderstatus".as("status")).as("info"),
      array(
        struct(lit(1).as("pid"),
          concat(lit("p1_"), $"o_custkey".cast("string")).as("puuid"),
          $"o_totalprice".as("gold")),
        struct(lit(2).as("pid"),
          concat(lit("p2_"), $"o_custkey".cast("string")).as("puuid"),
          (-$"o_totalprice").as("gold"))).as("participants"))
    docs
      .select($"o_orderkey", $"info", explode($"participants").as("p"))
      .select($"o_orderkey", $"p.pid".as("pid"), $"p.puuid".as("puuid"),
        $"p.gold".as("gold"), $"info.priority".as("priority"), $"info.status".as("status"))
  }, Some("""
    SELECT o_orderkey, 1 AS pid, 'p1_' || CAST(o_custkey AS VARCHAR) AS puuid,
           o_totalprice AS gold, o_orderpriority AS priority, o_orderstatus AS status
    FROM orders
    UNION ALL
    SELECT o_orderkey, 2, 'p2_' || CAST(o_custkey AS VARCHAR),
           -o_totalprice, o_orderpriority, o_orderstatus
    FROM orders
    ORDER BY o_orderkey, pid"""),
    sortCols = Seq("o_orderkey", "pid"))

  /** E2 frames→events concatenation (`lambda_function.py:139-143`):
    * `flatten(frames.events)` then explode — all events of all frames,
    * no intermediate per-frame explode. */
  val explodeEvents = Q("explode_events", (s, d) => {
    import s.implicits._
    val ev = (t: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =>
      struct(t.as("t"), v.as("v"))
    val docs = Tables.events(s, d).select(
      $"event_id",
      array(
        struct(lit(1).as("f"),
          array(ev($"event_type", $"value"), ev(lit("frame_end"), lit(0.0))).as("events")),
        struct(lit(2).as("f"),
          array(ev(concat($"event_type", lit("_2")), -$"value")).as("events"))).as("frames"))
    docs
      .select($"event_id", explode(F.flatten($"frames.events")).as("ev"))
      .select($"event_id", $"ev.t".as("t"), $"ev.v".as("v"))
  }, Some("""
    SELECT event_id, event_type AS t, value AS v FROM events
    UNION ALL
    SELECT event_id, 'frame_end', 0.0 FROM events
    UNION ALL
    SELECT event_id, event_type || '_2', -value FROM events
    ORDER BY event_id, t, v"""),
    sortCols = Seq("event_id", "t", "v"))

  /** E3 participantFrames map explode — INTENDED semantics (every frame ×
    * every map key), plus E5 struct hoist of the nested position struct.
    * The reference's dedented loop emits only the LAST frame
    * (`lambda_function.py:145-155`); see [[explodePframesLast]]. */
  val explodePframes = Q("explode_pframes", (s, d) => {
    import s.implicits._
    val pf = (g: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
      struct(g.as("currentGold"), struct(x.as("x"), ($"user_id" % 100).as("y")).as("position"))
    val docs = Tables.events(s, d).select(
      $"event_id",
      array(
        struct(lit(60000L).as("timestamp"),
          map(lit("1"), pf($"value", $"user_id"), lit("2"), pf(-$"value", $"user_id" + 1))
            .as("participantFrames")),
        struct(lit(120000L).as("timestamp"),
          map(lit("1"), pf($"value" * 2, $"user_id")).as("participantFrames"))).as("frames"))
    docs
      .select($"event_id", explode($"frames").as("f"))
      .select($"event_id", $"f.timestamp".as("ts_frame"),
        explode($"f.participantFrames").as(Seq("participantId", "pf")))
      .select($"event_id", $"ts_frame", $"participantId",
        $"pf.currentGold".as("currentGold"),
        $"pf.position.x".as("position_x"), $"pf.position.y".as("position_y"))
  }, Some("""
    SELECT event_id, CAST(60000 AS BIGINT) AS ts_frame, '1' AS participantId,
           value AS currentGold, user_id AS position_x, user_id % 100 AS position_y
    FROM events
    UNION ALL
    SELECT event_id, 60000, '2', -value, user_id + 1, user_id % 100 FROM events
    UNION ALL
    SELECT event_id, 120000, '1', value * 2, user_id, user_id % 100 FROM events
    ORDER BY event_id, ts_frame, participantId"""),
    sortCols = Seq("event_id", "ts_frame", "participantId"))

  /** E3 — FAITHFUL semantics: the reference's dedent bug keeps only the
    * last frame's participantFrames, stamped with the last timestamp
    * (`lambda_function.py:145` sits outside the frames loop — SURVEY §2.4).
    * Kept as its own query so the divergence is executable, not a footnote. */
  val explodePframesLast = Q("explode_pframes_last", (s, d) => {
    import s.implicits._
    val docs = Tables.events(s, d).select(
      $"event_id",
      array(
        struct(lit(60000L).as("timestamp"),
          map(lit("1"), $"value", lit("2"), -$"value").as("participantFrames")),
        struct(lit(120000L).as("timestamp"),
          map(lit("1"), $"value" * 2).as("participantFrames"))).as("frames"))
    docs
      // element_at (not try_): -1 is always valid on the 2-frame array, and
      // try_element_at's generated code fails to compile (interpreted-mode
      // fallback) on array-of-struct-of-map input in Spark 4.1.
      .select($"event_id", element_at($"frames", -1).as("f"))
      .select($"event_id", $"f.timestamp".as("ts_frame"),
        explode($"f.participantFrames").as(Seq("participantId", "currentGold")))
  }, Some("""
    SELECT event_id, CAST(120000 AS BIGINT) AS ts_frame, '1' AS participantId,
           value * 2 AS currentGold
    FROM events ORDER BY event_id, participantId"""),
    sortCols = Seq("event_id", "participantId"))

  /** E7 player-map explode (`lambda_function.py:100-108`):
    * `{puuid: stats}` map → rows `{puuid, stats.*}`. */
  val explodeMap = Q("explode_map", (s, d) => {
    import s.implicits._
    val st = (lp: org.apache.spark.sql.Column) =>
      struct(lp.as("leaguePoints"), $"s_nationkey".as("nation"))
    Tables.supplier(s, d)
      .select($"s_suppkey", map(
        concat(lit("p_"), $"s_suppkey".cast("string")), st($"s_acctbal"),
        concat(lit("q_"), $"s_suppkey".cast("string")), st(-$"s_acctbal")).as("player_map"))
      .select($"s_suppkey", explode($"player_map").as(Seq("puuid", "stats")))
      .select($"s_suppkey", $"puuid",
        $"stats.leaguePoints".as("leaguePoints"), $"stats.nation".as("nation"))
  }, Some("""
    SELECT s_suppkey, 'p_' || CAST(s_suppkey AS VARCHAR) AS puuid,
           s_acctbal AS leaguePoints, s_nationkey AS nation
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'q_' || CAST(s_suppkey AS VARCHAR), -s_acctbal, s_nationkey
    FROM supplier
    ORDER BY s_suppkey, puuid"""),
    sortCols = Seq("s_suppkey", "puuid"))

  /** P2 prefix-strip rename (`lambda_function.py:236-244`): strip the FIRST
    * occurrence of `challenges_` / `missions_` — `challenges_challenges_name`
    * keeps one prefix, proving replace-first semantics. */
  val renamePrefix = Q("rename_prefix", (s, d) => {
    import s.implicits._
    val flat = Tables.customer(s, d).select(
      $"c_custkey",
      $"c_acctbal".as("challenges_kda"),
      $"c_mktsegment".as("missions_segment"),
      $"c_name".as("challenges_challenges_name"))
    Normalize.stripPrefixes(flat, Seq("challenges_", "missions_"))
  }, Some("""
    SELECT c_custkey, c_acctbal AS kda, c_mktsegment AS segment,
           c_name AS challenges_name
    FROM customer ORDER BY c_custkey"""),
    sortCols = Seq("c_custkey"))

  val all: Seq[Q] = Seq(
    flatten, flattenPerks, explodeParticipants, explodeEvents,
    explodePframes, explodePframesLast, explodeMap, renamePrefix)
}
