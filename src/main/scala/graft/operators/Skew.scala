package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (builder brief: "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles sort-merge skew
  * automatically; explicit salting is for the cases AQE can't re-plan —
  * a hot key flooding one reducer in a shuffled equi-join against a
  * modest dimension, or high-cardinality state aggregation.
  *
  * Salt is DERIVED (hash of a distinguishing column, mod saltN), not
  * random — deterministic plans re-run identically, and retried tasks
  * don't double-count. */
object Skew {

  /** Shuffled equi-join with the fact side salted and the (modest)
    * dimension side replicated saltN×: the hot key's rows spread over
    * saltN reducers instead of one. Equivalent to `facts.join(dims,
    * keys)` row-for-row. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
      distinguishCol: String, saltN: Int): DataFrame = {
    val salted = facts.withColumn("_salt",
      pmod(hash(col(distinguishCol)), lit(saltN)).cast("int"))
    val replicated = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase salted aggregation for NON-algebraic aggregates (e.g.
    * collect_list state too big for one reducer): partial per (key,
    * salt), then merge. Algebraic aggs (sum/count/min/max) don't need
    * this — Spark's partial aggregation already spreads them. */
  def saltedCollect(df: DataFrame, key: String, valueCol: String,
      distinguishCol: String, saltN: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(distinguishCol)), lit(saltN)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("_partial")))).as(s"${valueCol}s"))
}
