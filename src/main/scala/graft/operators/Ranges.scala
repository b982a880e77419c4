package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — points joined into `[start, end)` intervals with NO equi
  * key (builder brief's second named missing operator). A naive plan is a
  * cartesian product with a filter; the scale path decomposes intervals
  * into fixed-width buckets: each range explodes into the buckets it
  * covers, each point joins on its own bucket, and the residual predicate
  * filters within the bucket. The shuffle is an equi-join on the bucket
  * id — cost O(points + ranges·span/width) instead of |points|·|ranges|.
  * A point meets a matching range in exactly one bucket (its own), so no
  * dedup pass is needed. */
object Ranges {

  /** All columns are LONG (callers convert timestamps to epoch units).
    * `end` is exclusive. Pick `bucketWidth` near the typical range span
    * so each range explodes into O(1) buckets. */
  def bucketedRangeJoin(points: DataFrame, ranges: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val r = ranges.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(r, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
