package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Beyond-reference extensions SURVEY explicitly earmarks (§2.6 "Catalyst
  * provides if we extend", §2.10 "Spark built-ins if extended"): sliding
  * windows, session windows, rollup/grouping-sets aggregation, and a
  * count-min sketch. Each stays a single shuffle with partial
  * aggregation. */
object Extensions {

  /** Sliding event-time windows (4-day window, 2-day slide): each event
    * lands in len/slide windows; Spark's `window` generates them
    * map-side, then one grouped aggregation. */
  val windowSliding = Q("window_sliding", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "4 days", "2 days").as("w"))
      .agg(count(lit(1)).as("n"), sumd($"value").as("sum_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
        date_format($"w.end", "yyyy-MM-dd HH:mm:ss").as("win_end"), $"n", $"sum_value")
  }, Some(s"""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL 2 DAYS, ts, TIMESTAMP '1970-01-01') AS win_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 2 DAYS, ts, TIMESTAMP '1970-01-01') - INTERVAL 2 DAYS, value FROM events)
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(win_start + INTERVAL 4 DAYS, '%Y-%m-%d %H:%M:%S') AS win_end,
           COUNT(*) AS n, ${sumdSql("value")} AS sum_value
    FROM shifted GROUP BY 1, 2 ORDER BY win_start"""),
    sortCols = Seq("win_start"))

  /** Session windows (1-hour inactivity gap) per user: Spark's
    * `session_window` merges in one aggregation; the oracle sessionizes
    * classically (lag → break flags → running session id). Session end =
    * last event + gap (Spark semantics). */
  val sessionWindow = Q("session_window", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .filter($"user_id".isNotNull)
      .groupBy($"user_id", session_window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id",
        date_format($"w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format($"w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        $"n")
  }, Some("""
    WITH e AS (SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
    m AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id,
      strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      strftime(max(ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      COUNT(*) AS n
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start"""),
    sortCols = Seq("user_id", "session_start"))

  /** Rollup census: event counts at (user, type), per-user, and grand
    * totals in one pass — the reference's per-level counters (A2/A6)
    * collapsed into a single grouping-sets aggregation. */
  val rollupCensus = Q("rollup_census", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .filter($"user_id" < 20)
      .rollup($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
  }, Some("""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events WHERE user_id < 20
    GROUP BY ROLLUP(user_id, event_type)
    ORDER BY user_id NULLS FIRST, event_type NULLS FIRST, n"""),
    sortCols = Seq("user_id", "event_type", "n"))

  /** Grouping-sets census: exactly the level combinations a dashboard
    * needs — per (user,type), per type, and grand total — without
    * rollup's unused intermediate level. */
  val groupingSets = Q("grouping_sets", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .filter($"user_id" < 20)
      .groupingSets(
        Seq(Seq($"user_id", $"event_type"), Seq($"event_type"), Seq.empty),
        $"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
  }, Some("""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events WHERE user_id < 20
    GROUP BY GROUPING SETS ((user_id, event_type), (event_type), ())
    ORDER BY user_id NULLS FIRST, event_type NULLS FIRST, n"""),
    sortCols = Seq("user_id", "event_type", "n"))

  /** Count-min sketch build + probe + admissibility: sketch `event_type`
    * frequencies into a 4×64 table, probe every distinct type PLUS a key
    * that was never inserted, and show the CMS invariant (estimate ≥ true
    * count) holds row by row. The unseen key pins the left-join/coalesce
    * path in [[graft.operators.Sketches.countMinProbe]]: a probe hitting a
    * never-populated cell must answer 0, not drop the key or inflate the
    * min. */
  val countminSketch = Q("countmin_sketch", (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val sketch = graft.operators.Sketches.countMinBuild(ev, "event_type", 4, 64)
    val probeKeys = ev.select($"event_type").distinct()
      .unionByName(s.range(1).select(lit("never_inserted_key").as("event_type")))
    val est = graft.operators.Sketches.countMinProbe(
      sketch, probeKeys, "event_type", 4, 64)
    val truth = ev.groupBy($"event_type").agg(count(lit(1)).as("true_count"))
    est.join(truth, Seq("event_type"), "left")
      .select($"event_type", coalesce($"true_count", lit(0L)).as("true_count"),
        $"cms_estimate",
        ($"cms_estimate" >= coalesce($"true_count", lit(0L))).as("admissible"))
  }, Some {
    def cell(i: Int) =
      s"CAST(('0x' || substr(md5('cms$i:' || event_type), 1, 15)) AS BIGINT) % 64"
    val buildRows = (0 until 4).map(i =>
      s"SELECT $i AS depth, ${cell(i)} AS cell FROM events").mkString("\n      UNION ALL ")
    val probeRows = (0 until 4).map(i =>
      s"SELECT event_type, $i AS depth, ${cell(i)} AS cell FROM " +
        "(SELECT DISTINCT event_type FROM events UNION ALL SELECT 'never_inserted_key') dte")
      .mkString("\n      UNION ALL ")
    s"""
    WITH sk AS (SELECT depth, cell, COUNT(*) AS cnt FROM ($buildRows) GROUP BY 1, 2),
    pr AS ($probeRows),
    est AS (SELECT p.event_type, min(coalesce(sk.cnt, 0)) AS cms_estimate
            FROM pr p LEFT JOIN sk ON p.depth = sk.depth AND p.cell = sk.cell
            GROUP BY 1),
    t AS (SELECT event_type, COUNT(*) AS true_count FROM events GROUP BY 1)
    SELECT est.event_type, coalesce(t.true_count, 0) AS true_count, est.cms_estimate,
           est.cms_estimate >= coalesce(t.true_count, 0) AS admissible
    FROM est LEFT JOIN t ON t.event_type = est.event_type
    ORDER BY 1"""
  },
    sortCols = Seq("event_type"))

  /** HLL cardinality census (SURVEY §2.6, next to the CMS): distinct
    * users per event type via HyperLogLog++ (`approx_count_distinct`,
    * rsd 2%), asserted against the exact count with a 5% admissibility
    * bound. The HLL estimate is deterministic for a given input set
    * (order-insensitive register max), so the boolean is oracle-stable;
    * the oracle computes the exact side and expects the bound to hold. */
  val hllCensus = Q("hll_census", (s, d) => {
    graft.operators.Sketches.hllCensus(
      Tables.events(s, d), "user_id", "event_type")
  }, Some("""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type"""),
    sortCols = Seq("event_type"))

  /** Pivot census: order counts per priority × status, statuses pinned as
    * an EXPLICIT value list — `.pivot(col, values)` with the list skips
    * the extra distinct-scan Spark otherwise runs to discover the pivot
    * domain, and keeps the output schema static (a 100 TB pivot with a
    * discovered domain is a schema landmine). Single shuffle, conditional
    * partial aggs map-side. */
  val pivotCensus = Q("pivot_census", (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P")).agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"O", lit(0L)).as("n_open"),
        coalesce($"F", lit(0L)).as("n_filled"),
        coalesce($"P", lit(0L)).as("n_partial"))
  }, Some("""
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY 1 ORDER BY o_orderpriority"""),
    sortCols = Seq("o_orderpriority"))

  /** Per-entity time-series deltas (lag): value change and time gap vs the
    * previous event of the same user — the feature-engineering staple for
    * sequence models. One shuffle on user_id; the sort is within-partition.
    * Tie-break on event_id makes the frame total-ordered, so lag is
    * deterministic; value math is exact-decimal per the oracle contract. */
  val eventDelta = Q("event_delta", (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d).filter($"user_id".isNotNull)
      .select($"event_id", $"user_id",
        round(dec2($"value") - lag(dec2($"value"), 1).over(w), 2)
          .cast("double").as("delta_value"),
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"))
  }, Some("""
    SELECT event_id, user_id,
      CAST(ROUND(CAST(value AS DECIMAL(20,2))
           - lag(CAST(value AS DECIMAL(20,2))) OVER w, 2) AS DOUBLE) AS delta_value,
      epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  val all: Seq[Q] = Seq(windowSliding, sessionWindow, rollupCensus,
    groupingSets, countminSketch, hllCensus, pivotCensus, eventDelta)
}
