package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ingest-side semantics (SURVEY §2.1 S2/S10, §2.3 F2, §2.6 A3, §2.8 F10):
  * file-name recovery + substring routing, the sequential id-space probe,
  * union-of-keys schema discovery, and integer type-bound classification. */
object Ingest {

  /** S2 + F2 + S11: recover the source object name (`check_files`,
    * `Utils/S3.py:313-342`) via `input_file_name`, then route rows by key
    * substring exactly like the Lambda's branch
    * (`lambda_function.py:95,110,204`). The object name is the path
    * component matching the table root (`documents[^/]*`), NOT the last
    * component — a multi-file table would otherwise surface part-file
    * names and mis-route every row. */
  val routeFile = Q("route_file", (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        regexp_extract(input_file_name(), "documents[^/]*", 0).as("object_name"))
      .withColumn("route",
        when($"object_name".contains("player-maps"), "player_ranks_data")
          .when($"object_name".contains("documents"), "document_store")
          .otherwise("player_data"))
  }, Some("""
    SELECT doc_id, source, 'documents.parquet' AS object_name,
           'document_store' AS route
    FROM documents ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** S10 sequential id probe (`collection_test.py:34-63,90-122`):
    * `spark.range` over the id space, build `NA1_{n}` keys, probe the
    * match table, census hit/miss — the driver-loop probe as one
    * distributed join. The range side is generated (no scan); the probe
    * is a shuffled join on the key at scale. */
  val rangeProbe = Q("range_probe", (s, d) => {
    import s.implicits._
    val probe = s.range(1, 3001)
      .select($"id", concat(lit("NA1_"), $"id".cast("string")).as("game_key"))
    val o = Tables.orders(s, d).select($"o_orderkey")
    probe.join(o, $"id" === $"o_orderkey", "left")
      .select($"game_key", $"o_orderkey".isNotNull.as("found"))
      .groupBy($"found").agg(count(lit(1)).as("n"))
  }, Some("""
    WITH probe AS (
      SELECT i AS id, 'NA1_' || CAST(i AS VARCHAR) AS game_key
      FROM unnest(generate_series(1, 3000)) AS t(i)),
    j AS (SELECT p.game_key, (o.o_orderkey IS NOT NULL) AS found
          FROM probe p LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
            ON p.id = o.o_orderkey)
    SELECT found, COUNT(*) AS n FROM j GROUP BY found ORDER BY found"""),
    sortCols = Seq("found"))

  /** A3 union-of-keys schema aggregation (`set(col for row in rows ...)`,
    * `Utils/sql.py:29`): discover the key set of a JSON payload column —
    * explode keys, distributed distinct (same shape as Flatten's map-key
    * stats). */
  val schemaKeys = Q("schema_keys", (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(explode(json_object_keys($"props")).as("key"))
      .distinct()
  }, Some("""
    SELECT DISTINCT unnest(json_keys(props)) AS key FROM events
    ORDER BY key"""),
    sortCols = Seq("key"))

  /** F10 int range check (`value > 2147483647`, `sql.py:48-52`): classify
    * scaled ids against the INT bound — the inference rule behind
    * [[graft.operators.Evolve.toDdlType]] as a runnable census. */
  val typeBounds = Q("type_bounds", (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select(($"o_orderkey" * 1000000L).as("scaled_id"))
      .withColumn("ddl_type",
        when(abs($"scaled_id") > 2147483647L, "BIGINT").otherwise("INT"))
      .groupBy($"ddl_type").agg(count(lit(1)).as("n"))
  }, Some("""
    SELECT CASE WHEN abs(o_orderkey * 1000000) > 2147483647
                THEN 'BIGINT' ELSE 'INT' END AS ddl_type,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY ddl_type"""),
    sortCols = Seq("ddl_type"))

  val all: Seq[Q] = Seq(routeFile, rangeProbe, schemaKeys, typeBounds)
}
