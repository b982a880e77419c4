package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time semantics (SURVEY §2.8 F5-F9, §2.10 St2/A7): tumbling event-time
  * windows, watermark/resume points, epoch→date-part extraction, ISO
  * round-trips, the ms-vs-s heuristic, URL decode. */
object Temporal {

  /** St2 `window_tumbling` (`functions.sh:111-121`): the reference's
    * hand-rolled +2-day window state machine, as a declarative tumbling
    * window over event time. Partial-aggregates map-side; one shuffle on
    * the window key; at 100 TB the window column also becomes the
    * partition key of the sink (see `partition_prune`). */
  val windowTumbling = Q("window_tumbling", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "2 days").as("w"))
      .agg(count(lit(1)).as("n"), sumd($"value").as("sum_value"))
      // window bounds surface as formatted strings: a raw TimestampType
      // output carries tz metadata into parquet/arrow that the oracle's
      // naive timestamps don't — strings compare bit-exactly everywhere
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
        date_format($"w.end", "yyyy-MM-dd HH:mm:ss").as("win_end"),
        $"n", $"sum_value")
  }, Some(s"""
    SELECT strftime(time_bucket(INTERVAL 2 DAYS, ts, TIMESTAMP '1970-01-01'),
             '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(time_bucket(INTERVAL 2 DAYS, ts, TIMESTAMP '1970-01-01') + INTERVAL 2 DAYS,
             '%Y-%m-%d %H:%M:%S') AS win_end,
           COUNT(*) AS n,
           ${sumdSql("value")} AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY win_start"""),
    sortCols = Seq("win_start"))

  /** A7 max-id watermark (`collection_count.json`,
    * `collection_test.py:22-32`): the resume point a sequential probe
    * persists — single-row full-reduce. */
  val watermarkMax = Q("watermark_max", (s, d) => {
    import s.implicits._
    Tables.events(s, d).agg(
      max($"event_id").as("max_event_id"),
      date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ts"),
      count(lit(1)).as("n_events"))
  }, Some("""
    SELECT max(event_id) AS max_event_id,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
           COUNT(*) AS n_events
    FROM events"""))

  /** F5/F6: epoch→date parts + the hive key build
    * (`Utils/S3.py:93-111` — `matches/year=Y/month=M/day=D/batch_...`). */
  val epochParts = Q("epoch_parts", (s, d) => {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      date_format($"o_orderdate", "yyyy").as("y"),
      date_format($"o_orderdate", "MM").as("m"),
      date_format($"o_orderdate", "dd").as("dd"),
      concat(lit("matches/year="), date_format($"o_orderdate", "yyyy"),
        lit("/month="), date_format($"o_orderdate", "MM"),
        lit("/day="), date_format($"o_orderdate", "dd"),
        lit("/batch_"), date_format($"o_orderdate", "yyyyMMdd_HHmmss"),
        lit("_matches.json")).as("s3_key"))
  }, Some("""
    SELECT o_orderkey,
      strftime(o_orderdate, '%Y') AS y,
      strftime(o_orderdate, '%m') AS m,
      strftime(o_orderdate, '%d') AS dd,
      'matches/year=' || strftime(o_orderdate, '%Y') ||
        '/month=' || strftime(o_orderdate, '%m') ||
        '/day=' || strftime(o_orderdate, '%d') ||
        '/batch_' || strftime(o_orderdate, '%Y%m%d_%H%M%S') ||
        '_matches.json' AS s3_key
    FROM orders ORDER BY o_orderkey"""),
    sortCols = Seq("o_orderkey"))

  /** F8 ms/s heuristic (`Utils/S3.py:153-175`): epochs arrive mixed —
    * seconds and milliseconds — normalize with the reference's `>1e10 ⇒
    * ms` rule (integer div; post-epoch data). */
  val msHeuristic = Q("ms_heuristic", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", $"ts".cast("long").as("secs"))
      .withColumn("raw_epoch",
        when($"event_id" % 2 === 0, $"secs" * 1000 + 123).otherwise($"secs"))
      .select($"event_id", $"raw_epoch",
        when($"raw_epoch" > 10000000000L, expr("raw_epoch div 1000"))
          .otherwise($"raw_epoch").as("epoch_sec"))
  }, Some("""
    WITH t AS (SELECT event_id,
        CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events),
    r AS (SELECT event_id,
        CASE WHEN event_id % 2 = 0 THEN secs * 1000 + 123 ELSE secs END AS raw_epoch
      FROM t)
    SELECT event_id, raw_epoch,
      CASE WHEN raw_epoch > 10000000000 THEN raw_epoch // 1000
           ELSE raw_epoch END AS epoch_sec
    FROM r ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  /** F7 ISO-8601 round trip (`fromisoformat(s.replace('Z','+00:00'))`,
    * `S3.py:79,164`): format with Z suffix, strip, re-parse. */
  val isoParse = Q("iso_parse", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id",
        date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"))
      .withColumn("parsed",
        date_format(regexp_replace($"iso", "Z$", "").cast("timestamp"),
          "yyyy-MM-dd HH:mm:ss").as("parsed"))
  }, Some("""
    SELECT event_id,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
      strftime(CAST(regexp_replace(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), 'Z$', '') AS TIMESTAMP),
        '%Y-%m-%d %H:%M:%S') AS parsed
    FROM events ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  /** P11 URL decode (`urllib.parse.unquote`, `lambda_function.py:33-34`):
    * encode a key-ish string, decode it back (DuckDB lacks url_decode, so
    * the oracle states the round-trip identity directly). */
  val urlRoundtrip = Q("url_roundtrip", (s, d) => {
    import s.implicits._
    val encoded = regexp_replace($"c_name", "#", "%23")
    Tables.customer(s, d).select(
      $"c_custkey", encoded.as("encoded"), url_decode(encoded).as("decoded"))
  }, Some("""
    SELECT c_custkey, replace(c_name, '#', '%23') AS encoded,
           c_name AS decoded
    FROM customer ORDER BY c_custkey"""),
    sortCols = Seq("c_custkey"))

  val all: Seq[Q] = Seq(
    windowTumbling, watermarkMax, epochParts, msHeuristic, isoParse, urlRoundtrip)
}
