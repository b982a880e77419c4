package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** [[graft.functions.SimhashSig]] and [[graft.functions.RollingFp]] —
  * pinned bit-identical to the exploded / HOF twins the oracles were
  * verified against, including the null row semantics each twin has. */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, (0 until 50).map(i => s"w${i % 9}").mkString(" ")), // repeats vote
    (2L, "alpha beta gamma"),
    (3L, "beta alpha gamma"), // order flips fingerprint, not bag-of-words
    (4L, "single"),
    (5L, ""),
    (6L, "a  b   c"), // empty tokens from multi-space
    (7L, "héllo wörld 漢字 emoji🎉"))

  test("simhash kernel == exploded twin (md5 and xxhash64)") {
    val df = docs.toDF("doc_id", "text")
    for (xx <- Seq(false, true)) {
      val kernel = TextOps.simhashTable(df, "doc_id", "text", useXx = xx)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exploded = TextOps.simhashTableExploded(df, "doc_id", "text",
          if (xx) xxhash64(_) else graft.queries.hash60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(kernel == exploded, s"useXx=$xx")
    }
  }

  test("simhash: null-text docs are dropped, matching the explode") {
    val df = (docs :+ (8L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kernel = TextOps.simhashTable(df, "doc_id", "text")
    val exploded = TextOps.simhashTableExploded(df, "doc_id", "text")
    assert(kernel.count() == docs.size && exploded.count() == docs.size)
  }

  test("rolling_fp kernel == HOF fold, and order-sensitivity holds") {
    val df = docs.toDF("doc_id", "text")
    val both = df.select($"doc_id",
        TextOps.fingerprint(TextOps.tokens($"text")).as("k"),
        TextOps.fingerprintHof(TextOps.tokens($"text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((id, k, h) <- both) assert(k == h, s"doc $id")
    val fp = both.map(t => t._1 -> t._2).toMap
    assert(fp(2L) != fp(3L)) // order-sensitive
  }

  test("rolling_fp null semantics match the HOF (null array, null element)") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, null.asInstanceOf[Seq[String]]),
      (3L, Seq("a", null, "b"))).toDF("doc_id", "toks")
    val rows = df.select($"doc_id",
        TextOps.fingerprint($"toks").as("k"),
        TextOps.fingerprintHof($"toks").as("h"))
      .collect()
    for (r <- rows)
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getLong(1) == r.getLong(2)), s"doc ${r.getLong(0)}")
    assert(rows.count(_.isNullAt(1)) == 2) // null array AND poisoned fold
  }

  test("simhash table is a narrow zero-exchange codegen projection") {
    val df = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", lit("tok"), col("id").cast("string"), lit("x y z")).as("text"))
    val plan = TextOps.simhashTable(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("HashAggregate"), plan)
    assert(plan.contains("*(1) Project"), s"not codegen-fused:\n$plan")
  }
}
