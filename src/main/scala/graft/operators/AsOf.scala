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
    * @param matchedTsName output column holding the matched right ts */
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
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (valueCols :+ matchedTsName).foldLeft(u) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("_m") === 1).drop("_ts", "_m")
  }
}
