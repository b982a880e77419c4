package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The native in-bucket pair generators ([[graft.functions.BucketPairs]])
  * pinned row-identical to the HOF expansions they replace, on crafted
  * buckets covering the gate edges (eq == threshold, singleton buckets,
  * equal signatures) and on the end-to-end near-dup path. */
class BucketPairsSpec extends SparkSpec {
  import spark.implicits._

  private def sig(xs: Long*): Seq[Long] = xs.toSeq

  test("bucket_pairs_verified == HOF expansion, gate edges included") {
    // k=4 signatures: pairs agree on 4, 3, 2, 0 components
    val a = (1L, sig(1, 2, 3, 4))
    val b = (2L, sig(1, 2, 3, 4)) // eq(a,b)=4
    val c = (3L, sig(1, 2, 3, 9)) // eq(a,c)=3  (== threshold)
    val e = (4L, sig(1, 2, 8, 9)) // eq(a,e)=2 (below); eq(c,e)=3
    val f = (5L, sig(7, 8, 9, 6)) // eq=0 with all
    // production pre-filters size(ds) > 1 before either expansion (the
    // HOF's sequence(0, size-2) would go descending on a singleton)
    val buckets = Seq(
      Seq(a, b, c, e, f),
      Seq(b, c))           // eq(b,c)=3
      .toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("i"), r.getField("_2").as("g"))).as("ds"))
    val viaGen = buckets
      .select(call_function("bucket_pairs_verified", col("ds"), lit(3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaHof = TextOps.verifiedPairsHof(buckets, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaGen == viaHof)
    assert(viaGen == Set((1L, 2L, 4), (1L, 3L, 3), (2L, 3L, 3), (3L, 4L, 3)))
    // the generator itself is singleton-safe (emits nothing)
    val single = Seq(Seq(a)).toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("i"), r.getField("_2").as("g"))).as("ds"))
    assert(single.select(
      call_function("bucket_pairs_verified", col("ds"), lit(3))).count() == 0)
  }

  test("bucket_pairs == HOF id expansion") {
    val buckets = Seq(Seq(3L, 1L, 2L), Seq(5L, 6L))
      .toDF("ids")
    val viaGen = buckets.select(call_function("bucket_pairs", col("ids")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaHof = TextOps.candidatePairsHof(buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGen == viaHof)
    // iteration is array order (callers pass sort_array output)
    assert(viaGen == Set((3L, 1L), (3L, 2L), (1L, 2L), (5L, 6L)))
    assert(Seq(Seq(7L)).toDF("ids")
      .select(call_function("bucket_pairs", col("ids"))).count() == 0)
  }

  test("bucket_hamming_pairs gates at popcount(xor) <= max") {
    val buckets = Seq(Seq(
      (1L, 0x0FL),  // vs 2: xor=0x01 -> 1; vs 3: xor=0xF0F -> 8; vs 4: far
      (2L, 0x0EL),
      (3L, 0xF00L),
      (4L, 0x7FFFFFFFL)))
      .toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("id"), r.getField("_2").as("h"))).as("ds"))
    val got = buckets
      .select(call_function("bucket_hamming_pairs", col("ds"), lit(8)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 8), (2L, 3L, 7)))
  }

  test("end-to-end: verified pairs via generator equal the pre-generator path") {
    val baseWords = (0 until 60).map(i => s"tok$i")
    val docs = Seq(
      (1L, baseWords.mkString(" ")),
      (2L, baseWords.updated(30, "CHANGED").mkString(" ")),
      (3L, "completely unrelated text about spark shuffles and executors"),
      (4L, baseWords.mkString(" "))).toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(docs, "doc_id", "text")
    val viaGen = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val buckets = TextOps.bandTableFromSignatures(sigs, "doc_id", keepSig = true)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(struct(col("doc_id").as("i"), col("sig").as("g")))).as("ds"))
      .filter(size(col("ds")) > 1)
    val viaHof = TextOps.verifiedPairsHof(buckets, TextOps.verifyMinEqual)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaGen == viaHof)
    assert(viaGen.exists(p => p._1 == 1L && p._2 == 4L && p._3 == TextOps.minhashA.size))
  }

  test("sig-join default equals the bucket-carried one-pass form (pairs AND n_eq)") {
    // round-14: the default long-key path verifies via joins against the
    // barriered (id, sig) frame; the pre-round-14 one-pass form carried
    // signatures in the bucket rows and verified inside the generator.
    // Same rich fixture as the distinct-twin test: 0-tweak clones
    // collide in all 4 bands (first-band suppression exercised), tweaked
    // clones land near the 8/16 gate (gate edges exercised).
    val rnd = new scala.util.Random(41)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val bases = (1 to 60).map { i =>
      i.toLong -> Seq.fill(20 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
    }
    val docs = (bases ++ bases.map { case (i, ws) =>
      val tweaked = (0 until rnd.nextInt(4)).foldLeft(ws) { (acc, _) =>
        acc.updated(rnd.nextInt(acc.size), words(rnd.nextInt(words.size)))
      }
      (i + 60L) -> tweaked
    }).map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(docs, "doc_id", "text")
    val sigJoin = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sigJoin.length == sigJoin.toSet.size,
      "sig-join output contains duplicate pair rows")
    val onePass = TextOps.verifiedPairsOnePass(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sigJoin.toSet == onePass,
      "sig-join verified pairs diverge from the one-pass bucket-carried form")
    assert(sigJoin.nonEmpty, "fixture produced no verified pairs — twin test is vacuous")
  }

  test("string-keyed tables fall back to the HOF path and still pair") {
    val docs = Seq(
      ("a", (0 until 40).map(i => s"w$i").mkString(" ")),
      ("b", (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(docs, "doc_id", "text")
    val pairs = TextOps.verifiedPairsFromSignatures(sigs, "doc_id").collect()
    assert(pairs.length == 1 && pairs.head.getString(0) == "a")
  }

  test("first-band rule: a pair colliding in several bands emits exactly once, at its first") {
    // synthetic 16-long signatures: docs 1 and 2 agree on components
    // 4..11 — bands 1 and 2 collide — and differ in bands 0 and 3.
    // Emit-everywhere would produce the pair twice (then need distinct);
    // the first-band form must emit it exactly once, from band 1
    // (band 2's bucket sees the pair's band-1 keys equal and suppresses).
    val sigs = Seq(
      (1L, (0 until 16).map(i => if (i >= 4 && i < 12) i.toLong else 100L + i)),
      (2L, (0 until 16).map(i => if (i >= 4 && i < 12) i.toLong else 200L + i)))
      .toDF("doc_id", "sig")
    val rows = TextOps.verifiedPairsFromSignatures(sigs, "doc_id", minEqual = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, 2L, 8)),
      s"expected exactly one emission of the cross-band pair, got ${rows.toSeq}")
  }

  test("first-band output is globally duplicate-free and set-equal to the distinct twin") {
    // the rich fixture from TextOpsSpec's differential: 60 random bases +
    // tweaked clones — 0-tweak clones collide in ALL 4 bands, so the old
    // path's pre-distinct multiset is strictly larger than the pair set
    // and any first-band mistake shows as either a duplicate row
    // (count != distinct count) or a set mismatch vs the twin
    val rnd = new scala.util.Random(23)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val bases = (1 to 60).map { i =>
      i.toLong -> Seq.fill(20 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
    }
    val docs = (bases ++ bases.map { case (i, ws) =>
      val tweaked = (0 until rnd.nextInt(4)).foldLeft(ws) { (acc, _) =>
        acc.updated(rnd.nextInt(acc.size), words(rnd.nextInt(words.size)))
      }
      (i + 60L) -> tweaked
    }).map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text")
    val sigs = TextOps.minhashSignatures(docs, "doc_id", "text")

    // verified path: first-band vs HOF + distinct
    val firstBand = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(firstBand.length == firstBand.toSet.size,
      "first-band verified output contains duplicate pair rows")
    val twinBuckets = TextOps.bandTableFromSignatures(sigs, "doc_id", keepSig = true)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(struct(col("doc_id").as("i"), col("sig").as("g")))).as("ds"))
      .filter(size(col("ds")) > 1)
    val twin = TextOps.verifiedPairsHof(twinBuckets, TextOps.verifyMinEqual)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(firstBand.toSet == twin)

    // candidate path: kp band table (first-band) vs plain band table + distinct
    val fbCand = TextOps.minhashCandidatePairs(
      TextOps.bandTableFromSignatures(sigs, "doc_id", keepKeyPrefix = true), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fbCand.length == fbCand.toSet.size,
      "first-band candidate output contains duplicate pair rows")
    val legacyCand = TextOps.minhashCandidatePairs(
      TextOps.bandTableFromSignatures(sigs, "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fbCand.toSet == legacyCand)
    assert(fbCand.nonEmpty)
  }

  test("struct-form bucket_pairs skips members with null/holed key prefixes") {
    val got = spark.sql("""
      SELECT bucket_pairs(array(
        named_struct('i', 1L, 'kp', array(10L)),
        CAST(NULL AS STRUCT<i: BIGINT, kp: ARRAY<BIGINT>>),
        named_struct('i', CAST(NULL AS BIGINT), 'kp', array(11L)),
        named_struct('i', 3L, 'kp', CAST(NULL AS ARRAY<BIGINT>)),
        named_struct('i', 4L, 'kp', array(CAST(NULL AS BIGINT))),
        named_struct('i', 2L, 'kp', array(20L))))""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    // an earlier-band key match suppresses the pair entirely
    val sup = spark.sql("""
      SELECT bucket_pairs(array(
        named_struct('i', 1L, 'kp', array(10L, 30L)),
        named_struct('i', 2L, 'kp', array(20L, 30L))))""").count()
    assert(sup == 0L)
  }

  test("lazy emission: eval streams pairs through an iterator cursor, no pair buffer (ADVICE r11)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // a guard-ceiling bucket buffered b(b-1)/2 InternalRows in one task
    // pre-fix (2^16 members → ~2^31 rows); the cursor holds ONE staged
    // row — heap is O(bucket members) for the unpacked ids/signatures,
    // never O(pairs)
    val ids = Literal.create((1L to 200L).toArray, ArrayType(LongType, containsNull = false))
    val out = graft.functions.BucketIdPairs(ids).eval(null)
    assert(out.isInstanceOf[Iterator[_]],
      s"expected a lazy Iterator, got ${out.getClass.getName}")
    val it = out.iterator
    // incremental consumption works: first pairs arrive in (i, j) order
    // without the rest being materialized
    assert(it.next().getLong(1) == 2L && it.next().getLong(1) == 3L)
    assert(it.size == 200 * 199 / 2 - 2) // the remaining pairs stream out
  }

  test("NULL gate literals are rejected at analysis, not unboxed to 0 (ADVICE r11)") {
    val buckets = Seq(Seq((1L, sig(1, 2)), (2L, sig(1, 2))))
      .toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("i"), r.getField("_2").as("g"))).as("ds"))
    // a NULL min_equal would unbox to 0 and emit EVERY pair (gate off)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      buckets.select(call_function("bucket_pairs_verified",
        col("ds"), lit(null).cast("int"))).collect()
    }
    assert(e1.getMessage.contains("non-null min_equal"))
    val hb = Seq(Seq((1L, 0L), (2L, 3L))).toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("id"), r.getField("_2").as("sh"))).as("ds"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      hb.select(call_function("bucket_hamming_pairs",
        col("ds"), lit(null).cast("int"))).collect()
    }
    assert(e2.getMessage.contains("non-null max_hamming"))
  }

  test("null bucket members are skipped, not read as garbage (ADVICE r11)") {
    // bucket_pairs: array<bigint> with a null hole — toLongArray would
    // silently read 0 for it; the generator must pair only real ids
    val idPairs = spark.sql(
      "SELECT bucket_pairs(array(1L, CAST(NULL AS BIGINT), 2L))")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idPairs == Set((1L, 2L)))
    // bucket_pairs_verified: null struct member, null id, null signature,
    // and a signature with a null component are all dropped
    val vp = spark.sql("""
      SELECT bucket_pairs_verified(array(
        named_struct('i', 1L, 'g', array(1L, 2L)),
        CAST(NULL AS STRUCT<i: BIGINT, g: ARRAY<BIGINT>>),
        named_struct('i', CAST(NULL AS BIGINT), 'g', array(1L, 2L)),
        named_struct('i', 3L, 'g', CAST(NULL AS ARRAY<BIGINT>)),
        named_struct('i', 4L, 'g', array(1L, CAST(NULL AS BIGINT))),
        named_struct('i', 2L, 'g', array(1L, 2L))), 2)""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(vp == Set((1L, 2L, 2)))
  }
}
