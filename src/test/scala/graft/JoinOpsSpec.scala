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

  test("asofJoin ≡ naive greatest-ts-at-or-before on randomized data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (s"u${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i))
      .toDF("k", "ts", "eid")
    val right = (1 to 60).map(i => (s"u${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i * 1.0))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max($"v").as("v")) // unique (k, ts)
    val fast = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select($"eid", $"v").collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    // naive: left-join all dims ≤ ts, keep the max dim ts per left row
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.eid"))
      .agg(max_by(col("r.v"), col("r.ts")).as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(fast == naive)
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
