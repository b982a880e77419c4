package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.operators.VerticalSplit

/** Core relational operator catalog (SURVEY §2 → §7.2 step 5).
  *
  * Each entry demonstrates one reference operator re-expressed Spark-first
  * over the driver parquet tables, with a DuckDB oracle. Key naming follows
  * SURVEY §2's "(key: ...)" annotations.
  */
object Relational {

  /** TPC-H-Q1-style grouped aggregation — the reference's only query-shaped
    * workload is SELECT+aggregate analysis (SURVEY §3.3, `dsa.ipynb`); this is
    * its canonical Spark form. Partial (map-side) aggregation + single shuffle
    * on the group keys; 6 aggregates share one scan. */
  val q1Agg = Q("q1_agg", (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumd($"l_quantity").as("sum_qty"),
        sumd($"l_extendedprice").as("sum_base_price"),
        round(sum(dec2($"l_extendedprice") * (lit(1).cast(DecimalType(10, 2)) - dec2($"l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        (sumd($"l_quantity") / count(lit(1))).as("avg_qty"),
        (sumd($"l_extendedprice") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }, Some("""
    SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(20,2)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,2))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,2))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  /** Production form of `q1_agg`: plain DOUBLE sums instead of the
    * DECIMAL(20,2) arithmetic the oracle contract requires. Last-bit
    * order-dependent (no portable oracle → rows-only check); its job is
    * the BENCH row quantifying what exact-decimal aggregation costs —
    * the aggregation-side sibling of the `*_xx` hash-tax rows. */
  val q1AggFast = Q("q1_agg_fast", (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        avg($"l_quantity").as("avg_qty"),
        avg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
  }, None, sortCols = Seq("l_returnflag", "l_linestatus"))

  /** A1: dedup (`set(matchesList)`, `EC2/fetcher.py:136`) — distinct on a key
    * projection. Column pruning reaches the scan; distinct is a partial-agg
    * shuffle on the key. No sort in the scale plan (oracle sort = sortCols). */
  val dedup = Q("dedup", (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      .distinct()
  }, Some("""
    SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem
    ORDER BY l_orderkey, l_partkey, l_suppkey"""),
    sortCols = Seq("l_orderkey", "l_partkey", "l_suppkey"))

  /** L1: head-N limit on the player list (`fetcher.py:107`). Deterministic
    * form = ORDER BY key + LIMIT → Spark TakeOrderedAndProject (no full sort
    * at scale). */
  val limitPlayers = Q("limit_players", (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
      .limit(50)
  }, Some("""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    ORDER BY c_custkey LIMIT 50"""))

  /** L3: rank-ordered priority fetch (challenger→…→DIAMOND, `fetcher.py:33-35`)
    * = top-k by rank value. TakeOrderedAndProject: per-partition heap + driver
    * merge — no global sort at 100 TB. */
  val topkRank = Q("topk_rank", (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_acctbal".desc, $"c_custkey")
      .limit(100)
  }, Some("""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 100"""))

  /** L4: union of tier scans (`high_elo.extend(low_elo)`, `fetcher.py:95`)
    * with schema evolution — the low side lacks a column, unionByName
    * null-pads it (P8 semantics, `Utils/sql.py:21-22`). */
  val unionTiers = Q("union_tiers", (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d)
    val high = c.filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name", $"c_acctbal", lit("HIGH").as("tier"))
    val low = c.filter($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey", $"c_name", lit("LOW").as("tier"))
    high.unionByName(low, allowMissingColumns = true)
      .orderBy($"c_custkey")
  }, Some("""
    SELECT c_custkey, c_name, c_acctbal, 'HIGH' AS tier FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, NULL AS c_acctbal, 'LOW' AS tier FROM customer WHERE c_mktsegment = 'MACHINERY'
    ORDER BY c_custkey"""))

  /** L5: leftovers = set-minus of attempted vs processed
    * (`processor.py:110,184`) — left ANTI join: customers with no orders.
    * Anti join build side is aggregated keys only; AQE picks broadcast when
    * the distinct-key side is small. */
  val leftoverAnti = Q("leftover_anti", (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }, Some("""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""))

  /** Complement of L5: the processed set — left SEMI join (EXISTS). */
  val existsSemi = Q("exists_semi", (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d).select($"l_orderkey")
    o.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_orderstatus")
  }, Some("""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    ORDER BY o_orderkey"""),
    sortCols = Seq("o_orderkey"))

  /** A4: category census (games-by-queue pie, `dsa.ipynb`) —
    * groupBy+count+order. */
  val censusByQueue = Q("census_by_queue", (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .groupBy($"p_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"p_type")
  }, Some("""
    SELECT p_type, COUNT(*) AS n FROM part
    GROUP BY p_type ORDER BY n DESC, p_type"""))

  /** A5: closed-form least squares (np.polyfit in `dsa.ipynb`) as pure
    * aggregates — one scan, one reduce; no driver-side math on rows.
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²); all sums exact decimal. */
  val linearFit = Q("linear_fit", (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val agg = li.agg(
      count(lit(1)).cast("double").as("n"),
      round(sum(dec2($"l_quantity")), 2).cast("double").as("sx"),
      round(sum(dec2($"l_extendedprice")), 2).cast("double").as("sy"),
      round(sum(dec2($"l_quantity") * dec2($"l_extendedprice")), 2).cast("double").as("sxy"),
      round(sum(dec2($"l_quantity") * dec2($"l_quantity")), 2).cast("double").as("sxx"))
    agg.select(
      (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
      (($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx") / $"n").as("intercept"),
      $"n".cast("long").as("n"))
  }, Some("""
    WITH a AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,2))), 2) AS DOUBLE) AS sx,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,2))), 2) AS DOUBLE) AS sy,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_extendedprice AS DECIMAL(20,2))), 2) AS DOUBLE) AS sxy,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_quantity AS DECIMAL(20,2))), 2) AS DOUBLE) AS sxx
      FROM lineitem)
    SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
           CAST(n AS BIGINT) AS n
    FROM a"""))

  /** J1/E6: build+probe hash lookup (`lambda_function.py:136,148`) —
    * broadcast hash join against a tiny dimension. */
  val lookupJoin = Q("lookup_join", (s, d) => {
    import s.implicits._
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    n.join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name", $"r_name")
      .orderBy($"n_nationkey")
  }, Some("""
    SELECT n_nationkey, n_name, r_name FROM nation
    JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey"""))

  /** P6: match-level enrichment onto participant rows
    * (`lambda_function.py:246-256`) — fact enriched from its parent entity. */
  val enrichMatch = Q("enrich_match", (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", to_date($"o_orderdate").as("o_date"),
        $"o_totalprice", $"c_name", $"c_mktsegment")
  }, Some("""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
           o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey"""),
    sortCols = Seq("o_orderkey"))

  /** P10: null/error row filters (`fetcher.py:114-116`, `processor.py:133`). */
  val filterNull = Q("filter_null", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .filter($"user_id".isNotNull && $"event_type" =!= "error")
      .select($"event_id", $"user_id", $"event_type", $"value")
  }, Some("""
    SELECT event_id, user_id, event_type, value FROM events
    WHERE user_id IS NOT NULL AND event_type <> 'error'
    ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  /** F11: numeric id extraction from a string id (`int(s[4:])`, `dsa.ipynb`). */
  val idExtract = Q("id_extract", (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey",
        substring($"c_name", 10, 18).cast("long").as("extracted_id"))
  }, Some("""
    SELECT c_custkey, CAST(substr(c_name, 10, 18) AS BIGINT) AS extracted_id
    FROM customer ORDER BY c_custkey"""),
    sortCols = Seq("c_custkey"))

  /** P4/P5/J2: vertical split + key propagation + rejoin = identity
    * (`Utils/json.py:72-100`). Exercises [[VerticalSplit]] over `orders`,
    * whose key is genuinely unique at EVERY scale factor (lineitem has no
    * unique natural key in the synthetic data — even the 4-part key
    * collides at sf0.001, which fans the rejoin out). */
  val rejoinSplit = Q("rejoin_split", (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val keys = Seq("o_orderkey")
    val parts = VerticalSplit.split(o, keys, Seq(
      "money" -> ((c: String) => c == "o_totalprice" || c == "o_orderstatus"),
      "when"  -> ((c: String) => c == "o_orderdate" || c == "o_orderpriority")))
    VerticalSplit.rejoin(
      Seq(parts("money"), parts("when")), keys)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
  }, Some("""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_orderkey"""),
    sortCols = Seq("o_orderkey"),
    // split∘rejoin=identity is a correctness demo: two full-width shuffles
    // for zero information — intentionally excluded from the bench set.
    headline = false)

  /** E1-analog over driver data: explode an array column to rows
    * (participants→rows, `lambda_function.py:221-258`). */
  val explodeWords = Q("explode_words", (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(split(trim($"text"), " ")).as("word"))
  }, Some("""
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
    FROM documents ORDER BY doc_id, word"""),
    sortCols = Seq("doc_id", "word"))

  /** F12: JSON parse of a string payload (`json.loads`, `S3.py:261`) —
    * from_json with an explicit schema (codegen'd, no UDF). */
  val jsonProps = Q("json_props", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id",
        from_json($"props", lit("k LONG")).getField("k").as("k"))
  }, Some("""
    SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id"""),
    sortCols = Seq("event_id"))

  /** S8/S9/J3: left-outer enrichment with string error sentinels
    * (`Utils/api.py:222-321`): customers with no orders get the
    * reference's "Error503"-style marker in an otherwise-numeric column
    * (mixed-type columns are a SURVEY §1.2 semantic to preserve). Build
    * side is pre-aggregated to one row per key before the join. */
  val enrichLeft = Q("enrich_left", (s, d) => {
    import s.implicits._
    val perCust = Tables.orders(s, d).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), sumd($"o_totalprice").as("spend"))
    Tables.customer(s, d)
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_name",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce(dec2($"spend").cast("string"), lit("Error503")).as("spend_or_error"))
  }, Some(s"""
    SELECT c_custkey, c_name,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(CAST(CAST(spend AS DECIMAL(20,2)) AS VARCHAR), 'Error503') AS spend_or_error
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders, ${sumdSql("o_totalprice")} AS spend
      FROM orders GROUP BY 1) o ON c_custkey = o_custkey
    ORDER BY c_custkey"""),
    sortCols = Seq("c_custkey"))

  val all: Seq[Q] = Seq(
    q1Agg, q1AggFast, dedup, limitPlayers, topkRank, unionTiers, leftoverAnti,
    existsSemi, censusByQueue, linearFit, lookupJoin, enrichMatch,
    enrichLeft, filterNull, idExtract, rejoinSplit, explodeWords, jsonProps)
}
