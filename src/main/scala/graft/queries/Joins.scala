package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{AsOf, Ranges}

/** The two join kinds the brief names as classically missing from Spark —
  * as-of and range — as oracle-checked queries (DuckDB has native ASOF
  * and general non-equi joins to verify against). */
object Joins {

  /** As-of join: every non-error event matched to the user's most recent
    * error "checkpoint" at or before its timestamp. */
  val asofJoin = Q("asof_join", (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).filter($"user_id".isNotNull)
    val dim = ev.filter($"event_type" === "error")
      .groupBy($"user_id", $"ts").agg(max($"value").as("checkpoint_val"))
    val left = ev.filter($"event_type" =!= "error")
      .select($"event_id", $"user_id", $"ts")
    AsOf.asofJoin(left, dim, Seq("user_id"), "ts", "ts",
      Seq("checkpoint_val"), matchedTsName = "checkpoint_ts")
      .select($"event_id", $"user_id", $"checkpoint_val",
        date_format($"checkpoint_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("checkpoint_ts"))
  }, Some("""
    WITH dim AS (SELECT user_id, ts, max(value) AS checkpoint_val
                 FROM events WHERE event_type = 'error' AND user_id IS NOT NULL
                 GROUP BY user_id, ts),
    ev AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type <> 'error' AND user_id IS NOT NULL)
    SELECT e.event_id, e.user_id, d.checkpoint_val,
           strftime(d.ts, '%Y-%m-%d %H:%M:%S.%f') AS checkpoint_ts
    FROM ev e ASOF LEFT JOIN dim d ON e.user_id = d.user_id AND e.ts >= d.ts
    ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  /** Range join: orders counted into 180-day priority launch periods
    * (no equi key — pure interval containment), via bucket decomposition
    * with 30-day buckets. */
  val rangeJoin = Q("range_join", (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val periods = o.groupBy($"o_orderpriority".as("period"))
      .agg(min($"o_orderdate").cast("timestamp").cast("long").as("start_s"))
      .withColumn("end_s", $"start_s" + 15552000L) // +180 days
    val points = o.select($"o_orderdate".cast("timestamp").cast("long").as("ts_s"))
    Ranges.bucketedRangeJoin(points, periods, "ts_s", "start_s", "end_s",
        bucketWidth = 2592000L) // 30-day buckets
      .groupBy($"period").agg(count(lit(1)).as("n"))
  }, Some("""
    WITH r AS (SELECT o_orderpriority AS period,
          CAST(floor(epoch(min(o_orderdate))) AS BIGINT) AS start_s
        FROM orders GROUP BY 1),
    r2 AS (SELECT period, start_s, start_s + 15552000 AS end_s FROM r),
    p AS (SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts_s FROM orders)
    SELECT r2.period, COUNT(*) AS n
    FROM p JOIN r2 ON p.ts_s >= r2.start_s AND p.ts_s < r2.end_s
    GROUP BY 1 ORDER BY period"""),
    sortCols = Seq("period"))

  val all: Seq[Q] = Seq(asofJoin, rangeJoin)
}
