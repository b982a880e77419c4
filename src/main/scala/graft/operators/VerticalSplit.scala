package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Vertical table splitting + key propagation + rejoin.
  *
  * Re-expresses the reference's `split_json` / `add_join_keys`
  * (`Utils/json.py:72-100`, SURVEY §2.3 P4/P5, §2.5 J2): one wide row is
  * partitioned into child tables by a column-name predicate, each child
  * carrying the join keys so the original row is recoverable by equi-join.
  *
  * Spark-first: each child is a pure projection of the SAME scan — Catalyst
  * prunes the parquet read per child, and a rejoin on the propagated keys is
  * a plain shuffled/broadcast equi-join. No data is rewritten to split.
  */
object VerticalSplit {

  /** Split `df` into named children. Each child = keys ++ matching columns.
    * A column goes to the FIRST group whose predicate matches (the reference
    * checks prefixes in a fixed order, `json.py:79-90`); unmatched columns go
    * to the `rest` child.
    */
  def split(
      df: DataFrame,
      keys: Seq[String],
      groups: Seq[(String, String => Boolean)],
      restName: String = "rest"): Map[String, DataFrame] = {
    val nonKey = df.columns.filterNot(keys.contains(_))
    val assigned = nonKey.map { c =>
      groups.find(_._2(c)).map(_._1).getOrElse(restName) -> c
    }
    val names = groups.map(_._1) :+ restName
    names.map { g =>
      val cols = assigned.collect { case (`g`, c) => c }
      g -> df.select((keys ++ cols).map(col): _*)
    }.toMap
  }

  /** Rejoin children on the propagated keys (inner equi-join chain). */
  def rejoin(parts: Seq[DataFrame], keys: Seq[String]): DataFrame =
    parts.reduce((a, b) => a.join(b, keys))
}
