package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Flatten

/** Differential test: the flatten COMPILER (schema → Columns, distributed)
  * against an independent plain-Scala BFS walk of the same rows (the
  * reference's dict semantics, `Utils/json.py:3-33`). Any disagreement in
  * naming, ordering, padding, key-union, or blacklist between the two
  * implementations fails. */
class FlattenDifferentialSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("s", StructType(Seq(
      StructField("name", StringType),
      StructField("xs", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("nested", ArrayType(ArrayType(IntegerType))),
      StructField("SWARM_stat", IntegerType)))))) // blacklisted leaf

  private case class Doc(id: Int, name: String, xs: List[Int],
      m: Map[String, Int], nested: List[List[Int]], swarm: Int)

  private val docGen: Gen[List[Doc]] = Gen.nonEmptyListOf(for {
    id <- Gen.chooseNum(0, 999)
    name <- Gen.alphaStr.map(_.take(5))
    xs <- Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-9, 9)))
    keys <- Gen.someOf(Seq("1", "2", "10", "a"))
    m <- Gen.sequence[List[(String, Int)], (String, Int)](
      keys.map(k => Gen.chooseNum(0, 99).map(k -> _))).map(_.toMap)
    no <- Gen.chooseNum(0, 2)
    nested <- Gen.listOfN(no, Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 9))))
    sw <- Gen.chooseNum(0, 9)
  } yield Doc(id, name, xs, m, nested, sw)).map(_.take(10))

  /** Reference semantics, independently: BFS with `_` paths, observed max
    * lengths / numeric-then-lexical key union, null padding, substring
    * blacklist — computed directly on the Scala data. */
  private def expected(docs: List[Doc]): (Seq[String], List[Map[String, Any]]) = {
    val maxXs = docs.map(_.xs.length).max
    val maxOuter = docs.map(_.nested.length).max
    val maxInner = (0 +: docs.flatMap(_.nested).map(_.length)).max
    val keys = {
      val ks = docs.flatMap(_.m.keys).distinct
      val (nums, rest) = ks.partition(_.forall(_.isDigit))
      nums.sortBy(_.toLong) ++ rest.sorted
    }
    // BFS levels: id | s.* leaves (name) then containers' children
    val cols =
      Seq("id", "s_name") ++
        (0 until maxXs).map(i => s"s_xs_$i") ++
        keys.map(k => s"s_m_$k") ++
        (for (i <- 0 until maxOuter; j <- 0 until maxInner) yield s"s_nested_${i}_$j")
    val rows = docs.map { d =>
      (Map("id" -> d.id, "s_name" -> d.name) ++
        (0 until maxXs).map(i => s"s_xs_$i" -> d.xs.lift(i).map(x => x: Any).orNull).toMap ++
        keys.map(k => s"s_m_$k" -> d.m.get(k).map(x => x: Any).orNull).toMap ++
        (for (i <- 0 until maxOuter; j <- 0 until maxInner)
          yield s"s_nested_${i}_$j" -> d.nested.lift(i).flatMap(_.lift(j)).map(x => x: Any).orNull).toMap)
        .asInstanceOf[Map[String, Any]]
    }
    (cols, rows)
  }

  test("compiled flatten ≡ independent reference walk on randomized documents") {
    for (i <- 0 until 6) {
      val docs = docGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val rows = docs.map(d => Row(d.id,
        Row(d.name, d.xs, d.m, d.nested, d.swarm)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq), schema)
      val out = Flatten.flatten(df)
      val (expCols, expRows) = expected(docs)
      assert(out.columns.toSet == expCols.toSet,
        s"seed $i: cols ${out.columns.toSet} vs $expCols")
      assert(!out.columns.exists(_.contains("SWARM")))
      val got = out.collect().map(r =>
        out.columns.map(c => c -> r.getAs[Any](c)).toMap).toList
      val key = (m: Map[String, Any]) => m.toSeq.sortBy(_._1).mkString("|")
      assert(got.map(key).sorted == expRows.map(key).sorted, s"seed $i rows differ")
    }
  }
}
