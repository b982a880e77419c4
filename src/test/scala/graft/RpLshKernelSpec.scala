package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** [[graft.functions.RpLshKeys]] — the per-row RP-LSH band-key kernel —
  * is pinned bit-identical to the exploded relational twin
  * ([[Vectors.rpLshBandsExploded]]) the DuckDB oracles were verified
  * against, across geometries and the edge shapes a vector column can
  * produce. The rplsh family (knn/probe/recall, semdedup_ann's key
  * artifact) rides on this equality. */
class RpLshKernelSpec extends SparkSpec {
  import spark.implicits._

  // edge vectors:
  //  - ordinary positive/negative mixes, including negative-half values
  //    (x·1e7 landing on ±.5 — the HALF_UP vs Math.round divergence),
  //  - an all-zero vector (every plane sum = 0 → bit false),
  //  - null CELLS (skipped in the sum), an all-null vector (bit null →
  //    band_key 0 in the exploded form),
  //  - an EMPTY vector (absent from the exploded key table entirely),
  //  - a null vector row (posexplode skips it).
  private val edge: Seq[(Long, Seq[java.lang.Float])] = Seq(
    1L -> Seq[java.lang.Float](0.1f, -0.2f, 0.3f, -0.4f),
    2L -> Seq[java.lang.Float](0.00000005f, -0.00000015f, 0.00000025f, -0.00000035f),
    3L -> Seq[java.lang.Float](0f, 0f, 0f, 0f),
    4L -> Seq[java.lang.Float](1f, null, -1f, null),
    5L -> Seq[java.lang.Float](null, null, null, null),
    6L -> Seq.empty[java.lang.Float],
    7L -> null)

  // Non-finite cells: under this repo's ANSI mode (Spark 4 default) the
  // exploded twin's round→cast(long) raises CAST_OVERFLOW, so the
  // kernel raises the SAME Spark error — never BigDecimal's bare
  // NumberFormatException (ADVICE r15), never a silently-divergent key.
  private val nonFinite: Seq[(Long, Seq[java.lang.Float])] = Seq(
    8L -> Seq[java.lang.Float](Float.NaN, 0.5f, Float.PositiveInfinity, -0.25f),
    9L -> Seq[java.lang.Float](Float.NegativeInfinity, Float.NaN, null, 1f))

  private def collectKeys(df: DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def edgeDf: DataFrame = edge.toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>"))

  test("kernel == exploded twin on edge vectors, both default geometries") {
    for ((planes, bands) <- Seq((8, 2), (16, 4))) {
      val kernel = collectKeys(
        Vectors.rpLshBands(edgeDf, "vec_id", "embedding", planes, bands))
      val exploded = collectKeys(
        Vectors.rpLshBandsExploded(edgeDf, "vec_id", "embedding", planes, bands))
      assert(kernel == exploded, s"geometry $planes/$bands")
    }
  }

  test("non-finite cells raise the ANSI cast error in BOTH forms") {
    val df = nonFinite.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    for (form <- Seq(
        Vectors.rpLshBands(df, "vec_id", "embedding", 16, 4),
        Vectors.rpLshBandsExploded(df, "vec_id", "embedding", 16, 4))) {
      val e = intercept[Exception] {
        form.collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      // SparkArithmeticException is private[spark]; match by the error
      // class in the message + the public ArithmeticException supertype
      assert(chain(e).exists(t => t.isInstanceOf[ArithmeticException] &&
          t.getMessage.contains("CAST_OVERFLOW")),
        s"expected CAST_OVERFLOW, got: $e")
    }
  }

  test("kernel == exploded twin on fixture embeddings, wide geometry included") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    for ((planes, bands) <- Seq((16, 4), (32, 4))) {
      val kernel = collectKeys(
        Vectors.rpLshBands(emb, "vec_id", "embedding", planes, bands))
      val exploded = collectKeys(
        Vectors.rpLshBandsExploded(emb, "vec_id", "embedding", planes, bands))
      assert(kernel == exploded, s"geometry $planes/$bands")
      assert(kernel.nonEmpty)
    }
  }

  test("the key derivation is a zero-exchange projection") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = Vectors.rpLshBands(emb, "vec_id", "embedding", 16, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"rplsh_keys grew an exchange — the kernel's whole point:\n$p")
    assert(p.contains("rplsh_keys"), "kernel call missing from the plan")
  }
}
