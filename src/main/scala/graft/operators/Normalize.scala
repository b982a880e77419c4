package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name / row-shape normalizations (SURVEY §2.3 P2/P3, §2.8 F4).
  *
  * All pure projections — rename via a single `select` of aliases (one
  * plan node), never a chain of `withColumnRenamed` (which stacks O(n)
  * Project nodes and slows analysis on wide flattened schemas).
  */
object Normalize {

  /** Strip the FIRST matching prefix, once, from each column name —
    * `challenges_*`→`*`, `missions_*`→`*` replace-first semantics
    * (`Lambda/lambda_function.py:236-244`). A name like
    * `challenges_challenges_x` keeps one prefix. */
  def stripPrefixes(df: DataFrame, prefixes: Seq[String]): DataFrame = {
    val names = df.columns.map { c =>
      prefixes.collectFirst {
        case p if c.startsWith(p) => c.substring(p.length)
      }.getOrElse(c)
    }
    // Fail fast on post-strip collisions (e.g. challenges_kda→kda when a
    // kda column already exists) — otherwise the select succeeds and the
    // failure surfaces later as an ambiguous-column error far from here.
    val dupes = names.groupBy(identity).collect { case (n, hits) if hits.length > 1 => n }
    require(dupes.isEmpty,
      s"stripPrefixes would produce duplicate column names: ${dupes.mkString(", ")}")
    df.select(df.columns.zip(names).map { case (c, n) => col(c).as(n) }.toSeq: _*)
  }

  /** P3: `rank`→`player_rank` rename + batch timestamp stamp
    * (`EC2/fetcher.py:98-103`). */
  def stampTimestamp(df: DataFrame, tsEpoch: Long,
      renames: Map[String, String] = Map("rank" -> "player_rank")): DataFrame = {
    val cols = df.columns.map(c => col(c).as(renames.getOrElse(c, c))) :+
      lit(tsEpoch).as("time_stamp")
    df.select(cols.toSeq: _*)
  }

  /** Coerce a dynamic-key struct (what `spark.read.json` infers for the
    * reference's `participantFrames` map keyed "1".."10" —
    * `lambda_function.py:145-148`, SURVEY §7.3) into a real MapType column
    * so it can be exploded. Field values must share a type (cast upstream
    * if not). */
  def structToMap(c: Column, st: org.apache.spark.sql.types.StructType): Column =
    map_from_arrays(
      array(st.fieldNames.map(lit(_)).toSeq: _*),
      array(st.fieldNames.map(c.getField(_)).toSeq: _*))

  /** Null-pad projection to a target column order — `align_row_data`
    * (`Utils/sql.py:21-22`, P8): target columns in target order, NULL for
    * columns the frame lacks. Delegates to [[Evolve.align]] (one
    * implementation of padding + cast semantics). */
  def alignTo(df: DataFrame, targetCols: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame =
    Evolve.align(df, org.apache.spark.sql.types.StructType(
      targetCols.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true)
      }))
}
