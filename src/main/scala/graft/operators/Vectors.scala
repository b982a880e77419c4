package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity primitives for embedding columns (`array<float>`) —
  * builder brief: brute-force cosine top-k baseline + bucketed variant as
  * the 100 TB scale path.
  *
  * Determinism contract (shared with the DuckDB oracle): every elementwise
  * product is computed in double, scaled by 1e12 and rounded to an integer
  * — summing exactly-representable integers (< 2^53) is order-independent,
  * so Spark's partitioned sums and DuckDB's sequential list_sum produce
  * bit-identical dot products and norms; cosine = dot / sqrt(n2a·n2b) is
  * then a deterministic IEEE expression of those integers.
  */
object Vectors {

  /** Scaled-integer dot product (as an integer-valued double). */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => round(x.cast("double") * y.cast("double") * 1e12)),
      lit(0.0), (acc, v) => acc + v)

  /** Scaled-integer squared norm. */
  def normScaled(a: Column): Column =
    aggregate(
      transform(a, x => round(x.cast("double") * x.cast("double") * 1e12)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity from scaled dot + scaled squared norms (the 1e12
    * scales cancel). */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / sqrt(n2a * n2b)

  /** Exact top-k rows per key, scale-safely: a partial top-k inside each
    * shuffle partition first (heap-sized window over (key, partition)),
    * THEN the global per-key window over the ≤ numPartitions·k survivors —
    * the classic salted top-k. A single window over `key` would funnel
    * every candidate row of a key through one reducer (billions of rows at
    * 100 TB); the partial pass bounds the final shuffle to k rows per
    * (key, partition). Emits `rank` 1..k by (orderCol DESC, tieCol ASC). */
  def topKPerKey(df: DataFrame, key: Column, orderCol: Column, tieCol: Column, k: Int): DataFrame = {
    val partial = Window.partitionBy(key, spark_partition_id())
      .orderBy(orderCol.desc, tieCol.asc)
    val fin = Window.partitionBy(key).orderBy(orderCol.desc, tieCol.asc)
    df.withColumn("_pr", row_number().over(partial)).filter(col("_pr") <= k).drop("_pr")
      .withColumn("rank", row_number().over(fin)).filter(col("rank") <= k)
  }
}
