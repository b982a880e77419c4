package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Ranges}

/** As-of and range join operator semantics on crafted edges (ties,
  * no-match, bucket boundaries) plus equivalence to naive formulations. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: inclusive tie, latest-wins, null before first dim row") {
    val left = Seq(
      ("u1", 5L, "e1"),   // matches dim@5 (inclusive tie)
      ("u1", 9L, "e2"),   // matches dim@7 (latest ≤ 9)
      ("u1", 2L, "e3"),   // before first dim → null
      ("u2", 9L, "e4"))   // u2 has no dim rows → null
      .toDF("k", "ts", "ev")
    val right = Seq(("u1", 5L, 50.0), ("u1", 7L, 70.0), ("u1", 11L, 110.0))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select($"ev", $"v", $"matched_ts").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_ -> r.get(2))).toMap
    assert(out("e1").contains((50.0, 5L)))
    assert(out("e2").contains((70.0, 7L)))
    assert(out("e3").isEmpty)
    assert(out("e4").isEmpty)
  }

  test("bucketedRangeJoin ≡ naive cross-join filter, incl. bucket-boundary points") {
    val points = (0L to 100L).toDF("p")
    val ranges = Seq(
      (0L, 10L, "a"),    // starts at a bucket boundary
      (9L, 30L, "b"),    // spans buckets
      (10L, 20L, "c"),   // [10,20): 10 in, 20 out
      (95L, 200L, "d"),  // extends past the point domain
      (50L, 50L, "e"))   // empty range
      .toDF("s", "e", "label")
    val fast = Ranges.bucketedRangeJoin(points, ranges, "p", "s", "e", bucketWidth = 10L)
      .select($"p", $"label")
    val naive = points.crossJoin(ranges)
      .filter($"p" >= $"s" && $"p" < $"e")
      .select($"p", $"label")
    assert(fast.count() == naive.count())
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
    // no duplicates from the bucket explode
    assert(fast.count() == fast.distinct().count())
  }
}
