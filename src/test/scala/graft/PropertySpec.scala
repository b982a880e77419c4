package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Evolve, Flatten, VerticalSplit}

/** Property-style tests (SURVEY §5): flatten lossless modulo blacklist,
  * split∘rejoin identity, evolve union keeps all columns, dedup idempotent.
  *
  * Uses ScalaCheck generators with FIXED seeds sampled in a plain suite
  * (the scalatest↔scalacheck bridge artifact isn't in the offline cache,
  * and deterministic cases are preferable for a correctness gate anyway).
  * Each case is a real Spark job — 6 seeds per property keeps `sbt test`
  * fast. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 6): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, List[Int], String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0, 1000)
      n <- Gen.chooseNum(0, 3)
      xs <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
      s <- Gen.alphaStr.map(_.take(6))
    } yield (id, xs, s)).map(_.take(12))

  test("flatten is lossless modulo blacklist: every scalar survives at its path") {
    for (rows <- samples(rowsGen)) {
      val df = rows.toDF("id", "xs", "name")
      val out = Flatten.flatten(df)
      val maxLen = rows.map(_._2.length).max
      assert(out.columns.toSeq ==
        Seq("id", "name") ++ (0 until maxLen).map(i => s"xs_$i"))
      val back = out.collect().map { r =>
        val xs = (0 until maxLen).map(i => r.getAs[Integer](s"xs_$i"))
          .takeWhile(_ != null).map(_.intValue).toList
        (r.getAs[Int]("id"), xs, r.getAs[String]("name"))
      }.toList
      assert(back.sortBy(_.toString) == rows.sortBy(_.toString))
    }
  }

  test("split ∘ rejoin = identity on unique keys") {
    for (rows0 <- samples(rowsGen)) {
      val rows = rows0.zipWithIndex.map { case ((_, xs, s), i) => (i, xs.length, s) }
      val df = rows.toDF("id", "n", "name")
      val parts = VerticalSplit.split(df, Seq("id"), Seq(
        "nums" -> ((c: String) => c == "n")))
      val back = VerticalSplit.rejoin(Seq(parts("nums"), parts("rest")), Seq("id"))
        .select("id", "n", "name")
      assert(back.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
        .toList.sorted == rows.sorted)
    }
  }

  test("unionEvolve keeps every input column exactly once") {
    for ((a, b) <- samples(Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(1, 4)))) {
      val cols1 = (0 until a).map(i => s"c$i")
      val cols2 = (0 until b).map(i => s"c${i + a / 2}") // overlap halfway
      val d1 = spark.range(1).select(
        cols1.zipWithIndex.map { case (c, i) => lit(i).as(c) }: _*)
      val d2 = spark.range(1).select(
        cols2.zipWithIndex.map { case (c, i) => lit(i.toLong).as(c) }: _*)
      val out = Evolve.unionEvolve(Seq(d1, d2))
      assert(out.columns.toSet == (cols1 ++ cols2).toSet)
      assert(out.columns.length == (cols1 ++ cols2).distinct.length)
      assert(out.count() == 2)
    }
  }

  test("distinct dedup is idempotent") {
    for (rows <- samples(rowsGen, 3)) {
      val df = (rows ++ rows).map(t => (t._1, t._3)).toDF("id", "name")
      val once = df.distinct()
      assert(once.distinct().count() == once.count())
      assert(once.count() == rows.map(t => (t._1, t._3)).distinct.size)
    }
  }

  test("hash60 is non-negative and below 2^60") {
    val strs = samples(Gen.alphaNumStr.map(_.take(20)), 12)
    val hs = strs.toDF("s").select(queries.hash60($"s").as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < (1L << 60)))
  }
}
