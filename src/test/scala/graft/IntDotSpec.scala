package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** Tests for the native `int_dot` Catalyst expression and the int8
  * quantization it serves: differential vs the HOF formulation, null
  * semantics, interpreted-vs-codegen parity, quantization bounds, and
  * the recall ordering of the quantized ANN family. */
class IntDotSpec extends SparkSpec {
  import spark.implicits._

  test("int_dot == HOF chain on 500 random int8 code vectors (fixed seed)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong,
        Seq.fill(n)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(n)((rnd.nextInt(255) - 127).toByte))
    }
    val df = rows.toDF("id", "a", "b").repartition(2)
    val diff = df.select(
      Vectors.intDot($"a", $"b").as("native"),
      Vectors.intDotHof($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.isEmpty, s"native/HOF divergence:\n${diff.head(3).mkString("\n")}")
  }

  test("int_dot accepts every integral element type and exact wide values") {
    val df = Seq((Seq[Byte](127, -127), Array(3, 4),
      Array(1000000000L, 2000000000L))).toDF("b8", "i32", "i64")
    val got = df.select(
      Vectors.intDot($"b8", $"i32").as("bi"),
      Vectors.intDot($"i64", $"i64").as("ll")).head()
    assert(got.getLong(0) == 127L * 3 - 127L * 4)
    // exact at magnitudes where a double-based kernel would round
    assert(got.getLong(1) == 1000000000L * 1000000000L + 2000000000L * 2000000000L)
  }

  test("int_dot null semantics: mismatched lengths and null elements → null") {
    val df = Seq(
      (1L, Array[java.lang.Integer](1, 2), Array[java.lang.Integer](1)),
      (2L, Array[java.lang.Integer](1, null), Array[java.lang.Integer](1, 1)),
      (3L, null, Array[java.lang.Integer](1))).toDF("id", "a", "b")
    val out = df.select($"id", Vectors.intDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("interpreted eval path (no codegen) matches codegen output") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val factory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      val rnd = new scala.util.Random(7)
      val df = (1 to 50).map { i =>
        (i.toLong, Seq.fill(32)((rnd.nextInt(255) - 127).toByte))
      }.toDF("id", "v")
      val withCodegen = df.select($"id", Vectors.intDot($"v", $"v").as("n"))
        .as[(Long, Long)].collect().toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select($"id", Vectors.intDot($"v", $"v").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
    }
  }

  test("int_dot is usable from SQL (SparkSessionExtensions registration)") {
    val n = spark.sql(
      "SELECT int_dot(array(CAST(1 AS TINYINT), CAST(2 AS TINYINT)), " +
        "array(CAST(3 AS TINYINT), CAST(4 AS TINYINT))) AS d")
      .head().getLong(0)
    assert(n == 11L)
  }

  test("quantizeInt8: codes bounded to [-127,127], tinyint type, zero vector → zeros") {
    val df = Seq(
      (1L, Array(0.5f, -2.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(1e-8f, -1e-8f, 0.0f)),
      // poisoned vectors must quantize to zeros, not kill the build
      // under ANSI's checked cast (non-finite max ⇒ degenerate)
      (4L, Array(Float.NaN, 1.0f, 2.0f)),
      (5L, Array(Float.PositiveInfinity, 1.0f, 2.0f))).toDF("id", "v")
      .select($"id", Vectors.quantizeInt8($"v").as("q"))
    assert(df.schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
    val rows = df.as[(Long, Seq[Byte])].collect().toMap
    // max-|x| component always hits ±127; everything is in range
    assert(rows(1L).toSeq == Seq[Byte](32, -127, 64))
    assert(rows(2L).toSeq == Seq[Byte](0, 0, 0))
    assert(rows(4L).toSeq == Seq[Byte](0, 0, 0))
    assert(rows(5L).toSeq == Seq[Byte](0, 0, 0))
    assert(rows.values.forall(_.forall(b => b >= -127 && b <= 127)))
  }

  test("codes lifecycle: an absorbed vector is immediately searchable at full fidelity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_codes").toString + "/codes"
    val rnd = new scala.util.Random(11)
    val base = (0L until 50L).map(i => (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    Vectors.writeCodes(base.toDF("id", "v"), "id", "v", dir)
    // absorb a twin of vector 3 under a new id: no retraining exists to
    // go stale, so its nearest neighbor must be the original, cos 1.0
    Vectors.absorbCodes(dir, Seq((100L, base(3)._2)).toDF("id", "v"), "id", "v")
    val c = spark.read.parquet(dir)
    assert(c.count() == 51)
    val q = c.filter($"vec_id" === 100L)
      .select($"q".as("qq"), $"qn2".as("qqn2"))
    val top = Vectors.topKPerKey(
        c.filter($"vec_id" =!= 100L).crossJoin(q)
          .select($"vec_id",
            Vectors.cosine(Vectors.intDot($"qq", $"q"), $"qqn2", $"qn2").as("cos_q")),
        lit(1), $"cos_q", $"vec_id", 1)
      .select($"vec_id", $"cos_q").head()
    assert(top.getLong(0) == 3L && top.getDouble(1) == 1.0,
      s"absorbed twin's nearest is ${top.get(0)} at ${top.get(1)}")
  }

  test("quantized cosine ranking: re-ranked recall ≥ raw quantized recall on the fixture") {
    val d = "/root/testdata/sf0.001"
    val truth = SparkEntry.queries("knn_cosine")(spark, d)
      .select($"qid", $"cid")
    def recallOf(name: String, cand: String): Double = {
      val ann = SparkEntry.queries(name)(spark, d).select($"qid", col(cand).as("cid"))
      val hits = truth.join(ann, Seq("qid", "cid"), "left_semi").count()
      hits.toDouble / truth.count()
    }
    val raw = recallOf("quant_knn", "cand_id")
    val rr = recallOf("quant_rerank", "cand_id")
    assert(rr >= raw, s"re-rank recall $rr below raw quantized recall $raw")
    // int8 on the 64-dim fixture vectors loses little: raw stays high
    assert(raw >= 0.8, s"raw quantized recall collapsed: $raw")
    assert(rr >= 0.95, s"re-ranked recall too low: $rr")
  }
}
