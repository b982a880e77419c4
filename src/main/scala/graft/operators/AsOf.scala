package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — match each left row to the most recent right row with
  * `rightTs <= leftTs` within the same partition keys (builder brief's
  * canonical "operator Spark lacks"; preference (a): composed from
  * existing ops, no custom physical operator needed).
  *
  * Shape: union the two sides, one window sorted by (ts, side-marker)
  * per partition key, `last(value, ignoreNulls)` carries the latest dim
  * value forward, keep the left rows. ONE shuffle+sort on the partition
  * key — the same cost as a sort-merge join, state is one row per value
  * column, and skew tools (salting) apply to the partition key as usual.
  * Dim rows order BEFORE left rows at equal timestamps, so the match is
  * inclusive (`<=`), matching DuckDB/kdb ASOF semantics. */
object AsOf {

  /** @param valueCols right-side columns carried onto matched left rows
    *                  (must not collide with left column names)
    * @param matchedTsName output column holding the matched right ts
    *
    * Duplicate (partCols, rightTs) rows on the right side: the result is
    * made deterministic by a secondary ordering on the value columns —
    * among equal-timestamp dim rows, the greatest (valueCols...) tuple
    * wins. Pre-aggregate the right side to unique (partCols, ts) when a
    * different tie policy is required. */
  def asofJoin(left: DataFrame, right: DataFrame, partCols: Seq[String],
      leftTsCol: String, rightTsCol: String, valueCols: Seq[String],
      matchedTsName: String = "matched_ts"): DataFrame = {
    val l2 = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_m", lit(1))
    val r2 = right.select(
      (partCols.map(col) :+ col(rightTsCol).as("_ts")) ++
        valueCols.map(col) :+ col(rightTsCol).as(matchedTsName): _*)
      .withColumn("_m", lit(0))
    val u = Evolve.unionEvolve(Seq(l2, r2))
    // valueCols tiebreak: at equal (_ts, _m) the window frame's last row —
    // the one last()/the carried values come from — is a fixed row, not
    // whichever the shuffle happened to order last (nulls first so left
    // rows, all-null in valueCols, still precede nothing at their own ts)
    val tiebreak = valueCols.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_ts").asc +: col("_m").asc +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (valueCols :+ matchedTsName).foldLeft(u) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("_m") === 1).drop("_ts", "_m")
  }
}
