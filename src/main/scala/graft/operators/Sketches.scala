package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.hash60

/** Count-min sketch, built relationally (builder brief's "novel sketch"
  * slot; preference (a): composed from existing ops — the sketch is a
  * grouped count, no custom TypedImperativeAggregate needed until merge
  * across pre-built sketches is required).
  *
  * Build: each row hashes into one cell per depth (independent salted
  * hash functions) → groupBy (depth, cell) count. The sketch table is
  * depth×width rows regardless of input size, built with ONE partial-agg
  * shuffle — the 100 TB frequency-estimate answer when exact per-key
  * counts' cardinality is unaffordable. Probe: a key's estimate is the
  * MIN of its cells across depths (classic CMS upper bound: estimates
  * never undercount). hash60 keeps the whole thing oracle-checkable. */
object Sketches {

  def cmsCell(keyCol: String, depth: Int, width: Int) =
    pmod(hash60(concat(lit(s"cms$depth:"), col(keyCol))), lit(width.toLong))

  /** (depth, cell, cnt) sketch table for a key column. */
  def countMinBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(i =>
      struct(lit(i).as("depth"), cmsCell(keyCol, i, width).as("cell")))
    df.select(explode(array(cells: _*)).as("x"))
      .select(col("x.depth").as("depth"), col("x.cell").as("cell"))
      .groupBy(col("depth"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Frequency estimates for `keys` (a small/distinct frame with
    * `keyCol`): min over depths of the key's cell counts. Left-joins the
    * sketch so a key hitting a never-populated cell contributes 0 — the
    * classic CMS answer for unseen keys — instead of inflating the min or
    * dropping the key from the output. */
  def countMinProbe(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(i =>
      struct(lit(i).as("depth"), cmsCell(keyCol, i, width).as("cell")))
    keys.select(col(keyCol), explode(array(cells: _*)).as("x"))
      .select(col(keyCol), col("x.depth").as("depth"), col("x.cell").as("cell"))
      .join(sketch, Seq("depth", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** HLL cardinality (SURVEY §2.6 extension next to the CMS):
    * `approx_count_distinct` is HyperLogLog++ — one partial-agg shuffle,
    * fixed-size register state, order-insensitive merge (a max per
    * register), so the estimate is DETERMINISTIC for a given input set.
    * Returns the estimate next to the exact count and a bound check —
    * the admissibility-style row the CMS query uses. At 100 TB the exact
    * side is the expensive one (a distinct shuffle); production keeps only
    * the sketch and the bound column becomes monitoring. */
  def hllCensus(df: DataFrame, keyCol: String, groupCol: String,
      rsd: Double = 0.02, bound: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        countDistinct(col(keyCol)).as("exact_distinct"),
        approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))
      .select(col(groupCol), col("exact_distinct"),
        // guard exact=0 (a group whose keys are all NULL): the relative
        // error is 0/0 there — admissible iff the sketch also says 0
        when(col("exact_distinct") === 0, col("approx_distinct") === 0)
          .otherwise(
            abs(col("approx_distinct") - col("exact_distinct")).cast("double") /
              col("exact_distinct") <= bound).as("within_bound"))
}
