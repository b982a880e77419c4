package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** Differential tests for the native `scaled_dot` Catalyst expression vs
  * the higher-order-function formulation it replaced: bit-identical
  * results (the oracle contract rides on this), same null semantics, and
  * both the codegen and interpreted paths. */
class ScaledDotSpec extends SparkSpec {
  import spark.implicits._

  test("scaled_dot == HOF chain bit-for-bit on 500 random float vectors (fixed seed)") {
    // exclude the HofScaledDotRewrite optimizer rule for this test — with
    // it active the HOF branch would silently BE the native kernel and
    // the differential would compare native against itself
    val prevExcluded = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.HofScaledDotRewrite")
    try {
      val rnd = new scala.util.Random(42)
      val rows = (1 to 500).map { i =>
        val n = 1 + rnd.nextInt(96)
        (i.toLong,
          Array.fill(n)((rnd.nextFloat() - 0.5f) * 4f),
          Array.fill(n)((rnd.nextFloat() - 0.5f) * 4f))
      }
      // repartition keeps ConvertToLocalRelation from folding the whole
      // projection at optimize time, so the plan shape is inspectable
      val df = rows.toDF("id", "a", "b").repartition(2)
      val hofPlan = df.select(Vectors.dotScaledHof($"a", $"b").as("hof"))
        .queryExecution.optimizedPlan.toString
      assert(hofPlan.contains("aggregate(") && !hofPlan.contains("scaled_dot"),
        "rule exclusion failed — the differential would be vacuous")
      val diff = df.select(
        Vectors.dotScaled($"a", $"b").as("native"),
        Vectors.dotScaledHof($"a", $"b").as("hof"),
        Vectors.normScaled($"a").as("n_native"),
        Vectors.normScaledHof($"a").as("n_hof"))
        .filter($"native" =!= $"hof" || $"n_native" =!= $"n_hof")
      assert(diff.isEmpty, s"native/HOF divergence:\n${diff.head(3).mkString("\n")}")
      // and the sums really are integer-valued doubles (the determinism basis)
      val nonInt = df.select(Vectors.dotScaled($"a", $"b").as("d"))
        .filter($"d" =!= round($"d"))
      assert(nonInt.isEmpty)
    } finally prevExcluded match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None    => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("HofScaledDotRewrite: handwritten HOF chains optimize to the native kernel") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5f, 0.25f))).toDF("a", "b")
      .repartition(2) // keep ConvertToLocalRelation from folding the plan
    val dot = df.select(Vectors.dotScaledHof($"a", $"b").as("d"))
    assert(dot.queryExecution.optimizedPlan.toString.contains("scaled_dot"),
      "dot form not rewritten")
    val norm = df.select(Vectors.normScaledHof($"a").as("n"))
    assert(norm.queryExecution.optimizedPlan.toString.contains("scaled_dot"),
      "norm form not rewritten")
    // rewritten plan computes the same values as the direct native call
    assert(dot.head().getDouble(0) ==
      df.select(Vectors.dotScaled($"a", $"b")).head().getDouble(0))
    // near-miss shapes are left alone: a different scale constant is NOT
    // the oracle-contract kernel and must stay an HOF aggregate
    val other = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => round(x.cast("double") * y.cast("double") * 1e6)),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val otherPlan = other.queryExecution.optimizedPlan.toString
    assert(!otherPlan.contains("scaled_dot") && otherPlan.contains("aggregate("),
      "rule over-matched a non-contract chain")
  }

  test("scaled_dot handles double arrays and float×double mixes (centroid joins)") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, -0.25))).toDF("f", "d")
    val got = df.select(
      Vectors.dotScaled($"f", $"d").as("fd"),
      Vectors.dotScaled($"d", $"d").as("dd"))
      .head()
    // 1·0.5e12 + 2·(−0.25e12) = 0;  0.5²e12 + 0.25²e12
    assert(got.getDouble(0) == 0.0)
    assert(got.getDouble(1) == 0.25e12 + 0.0625e12)
  }

  test("scaled_dot null semantics mirror the HOF chain: mismatched lengths and null elements → null") {
    val df = Seq(
      (1L, Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f)),
      (2L, Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 1f)),
      (3L, null, Array[java.lang.Float](1f))).toDF("id", "a", "b")
    val out = df.select($"id", Vectors.dotScaled($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("interpreted eval path (no codegen) matches codegen output") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val factory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      val rnd = new scala.util.Random(7)
      val df = (1 to 50).map { i =>
        (i.toLong, Array.fill(32)((rnd.nextFloat() - 0.5f) * 2f))
      }.toDF("id", "v")
      val withCodegen = df.select($"id", Vectors.normScaled($"v").as("n"))
        .as[(Long, Double)].collect().toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select($"id", Vectors.normScaled($"v").as("n"))
        .as[(Long, Double)].collect().toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
    }
  }

  test("scaled_dot is usable from SQL (SparkSessionExtensions registration)") {
    val n = spark.sql("SELECT scaled_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0)
    assert(n == 3e12 + 8e12)
  }

  test("wrong-arity calls to registered functions raise the standard WRONG_NUM_ARGS analysis error") {
    // ADVICE r16: the builders used require(), so a wrong-arity SQL call
    // surfaced as an IllegalArgumentException instead of the error class
    // built-ins raise; FunctionArity.check standardizes all of them
    for ((sql, fn) <- Seq(
        ("SELECT arg_max_by(1) FROM range(3)", "arg_max_by"),
        ("SELECT scaled_dot(array(1.0F))", "scaled_dot"),
        ("SELECT simhash_sig('a', 'b', 'c')", "simhash_sig"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getCondition != null &&
        e.getCondition.startsWith("WRONG_NUM_ARGS"), s"$fn: ${e.getCondition}")
      assert(e.getMessage.contains(fn), s"$fn not named: ${e.getMessage}")
    }
  }
}
