package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** TextOps semantics — especially the POSITIVE near-dup path that the
  * random driver corpus can't guarantee. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  // 60-word base doc; near-dup changes ONE word (Jaccard ≈ 55/61 ≈ 0.90 on
  // 3-shingles — high enough that ≥1 of the 4 fixed-constant bands collides).
  private val baseWords = (0 until 60).map(i => s"tok$i")
  private val nearDups = Seq(
    (1L, baseWords.mkString(" ")),
    (2L, baseWords.updated(30, "CHANGED").mkString(" ")), // near-duplicate
    (3L, "spark shuffles partition data across executors during wide transformations"),
    (4L, baseWords.mkString(" "))) // exact duplicate of 1

  private def bands(df: org.apache.spark.sql.DataFrame) =
    TextOps.minhashBandTable(df, "doc_id", "text")

  test("minhash LSH: exact dups share all bands, near-dups share some, unrelated none") {
    val df = nearDups.toDF("doc_id", "text")
    val b = bands(df)
    val pairs = b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 4L)) == TextOps.bands.toLong) // identical: all 4 bands collide
    assert(pairs.contains((1L, 2L)))                // near-dup: ≥1 band collides
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L))) // unrelated: none
  }

  test("pairJaccard: exact set Jaccard calibrates the signature estimate") {
    val df = nearDups.toDF("doc_id", "text")
    val m = TextOps.pairJaccard(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // exact duplicates: full signature agreement AND exact J = 1
    val dup = m((1L, 4L))
    assert(dup.getAs[Int]("n_eq") == 16)
    assert(dup.getAs[Double]("est_jaccard") == 1.0)
    assert(dup.getAs[Double]("exact_jaccard") == 1.0)
    // one word changed at index 30 of 60: 3 of 58 shingles differ per side
    // → |A∩B| = 55, |A∪B| = 61, J = 55/61 ≈ 0.902
    val near = m((1L, 2L))
    assert(near.getAs[Long]("n_inter") == 55 && near.getAs[Long]("n_union") == 61)
    assert(math.abs(near.getAs[Double]("exact_jaccard") - 55.0 / 61) < 1e-12)
    // the estimate is unbiased, not exact — just require it clears the gate
    assert(near.getAs[Int]("n_eq") >= TextOps.verifyMinEqual)
    // unrelated doc 3 appears in NO verified pair
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("expression-form minhash signature equals the aggregate table form") {
    val df = nearDups.toDF("doc_id", "text")
    val hv = TextOps.shingleHashes(TextOps.shingles(TextOps.tokens($"text")))
    val sigCols = TextOps.minhashSig($"hv").zipWithIndex.map { case (c, i) => c.as(s"s$i") }
    val exprForm = df.select($"doc_id", hv.as("hv")).select(($"doc_id" +: sigCols): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // table form: recompute the signatures the explode+groupBy way
    val hashed = df.select($"doc_id", explode(TextOps.shingles(TextOps.tokens($"text"))).as("sh"))
      .select($"doc_id", pmod(graft.queries.hash60($"sh"), lit(TextOps.P)).as("h"))
    val aggs = TextOps.minhashA.zip(TextOps.minhashB).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * $"h" + lit(b), lit(TextOps.P))).as(s"s$i") }
    val tableForm = hashed.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(exprForm == tableForm)
  }

  test("shingles: n-1 shingles for n tokens, whole-doc fallback under n words") {
    val df = Seq(("a b c d e", 3), ("a b", 1)).toDF("text", "expected")
    val out = df.select(size(TextOps.shingles(TextOps.tokens($"text"))).as("n"), $"expected")
    assert(out.collect().forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("band table's position-explode shingles == the shingles() HOF, doc by doc") {
    // 200 random docs incl. lengths 0..5 (whole-doc fallback territory)
    val rnd = new scala.util.Random(11)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "sed", "do")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // reference: explode the HOF shingles and hash them identically
    val hof = docs.select($"doc_id",
        org.apache.spark.sql.functions.explode(
          TextOps.shingles(TextOps.tokens($"text"))).as("sh"))
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list($"sh")).as("shs"))
    // under test: the band table's internals, recovered by re-deriving the
    // signature inputs — equality of the full band table proves the
    // shingle streams are identical (same multiset of hashes per doc)
    val viaTable = TextOps.minhashBandTable(docs, "doc_id", "text")
    val viaHof = {
      val hashed = docs.select($"doc_id".as("_mh_id"),
          org.apache.spark.sql.functions.explode(
            TextOps.shingles(TextOps.tokens($"text"))).as("sh"))
        .select($"_mh_id", org.apache.spark.sql.functions.pmod(
          graft.queries.hash60($"sh"),
          org.apache.spark.sql.functions.lit(TextOps.P)).as("h"))
      val sigAggs = TextOps.minhashA.zip(TextOps.minhashB).zipWithIndex.map {
        case ((a, b), i) => org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.lit(a) * $"h" +
              org.apache.spark.sql.functions.lit(b),
            org.apache.spark.sql.functions.lit(TextOps.P))).as(s"s$i")
      }
      val sigs = hashed.groupBy($"_mh_id").agg(sigAggs.head, sigAggs.tail: _*)
      val keys = TextOps.bandKeys((0 until TextOps.minhashA.size).map(i => $"s$i"))
      sigs.select($"_mh_id", org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array(keys.zipWithIndex.map { case (k, j) =>
            org.apache.spark.sql.functions.struct(
              org.apache.spark.sql.functions.lit(j).as("band"), k.as("band_key"))
          }: _*)).as("b"))
        .select($"_mh_id".as("doc_id"), $"b.band".as("band"), $"b.band_key".as("band_key"))
    }
    assert(viaTable.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaTable).isEmpty,
      "position-explode shingle stream diverged from the HOF shingles")
    assert(hof.count() == 200) // sanity: every doc produced shingles
  }

  test("verified pairs: a crafted band-colliding NON-duplicate survives the gate") {
    // synthetic signatures (bandTableFromSignatures works straight off a
    // signature frame, so the collision is crafted exactly): all three
    // docs agree on s0..s3 — band 0 collides pairwise — but only (1,3)
    // also agree beyond it (12/16 ≥ 8); (1,2) and (2,3) agree on 4/16.
    val sigs = Seq(
      (1L, (0 until 16).map(_.toLong)),
      (2L, (0 until 16).map(i => if (i < 4) i.toLong else 100L + i)),
      (3L, (0 until 16).map(i => if (i < 12) i.toLong else 200L + i)))
      .toDF("doc_id", "sig")
    // the raw LSH candidate stage sees all three pairs…
    val cand = TextOps.minhashCandidatePairs(
      TextOps.bandTableFromSignatures(sigs, "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // …but verification drops the two low-agreement collisions: the
    // band-colliding non-duplicates (1,2)/(2,3) SURVIVE dedup (are not
    // paired, so no clustering path can ever drop doc 2), while the
    // genuine near-dup pair (1,3) is confirmed with its agreement count
    val verified = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(verified == Set((1L, 3L, 12)))
  }

  test("verified pairs differential: n_eq == brute-force agreement; gate == threshold") {
    // small vocabulary ⇒ many genuine shingle collisions ⇒ a rich mix of
    // high- and low-agreement candidates to exercise both gate outcomes
    val rnd = new scala.util.Random(23)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    // 60 random bases + a tweaked clone of each (0-3 words replaced) —
    // clones guarantee candidates, and the varying tweak depth spreads
    // the agreement spectrum across the gate threshold
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
    val sigMap = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cand = TextOps.minhashCandidatePairs(
      TextOps.bandTableFromSignatures(sigs, "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(cand.nonEmpty, "fixture produced no candidates — nothing exercised")
    assert(verified.keySet.subsetOf(cand), "verified pairs are not a candidate subset")
    // every candidate is kept iff its true component agreement clears the
    // threshold, and the reported n_eq is exactly that agreement
    cand.foreach { case (a, b) =>
      val agree = sigMap(a).zip(sigMap(b)).count { case (x, y) => x == y }
      assert(verified.contains((a, b)) == (agree >= TextOps.verifyMinEqual),
        s"gate wrong for ($a,$b): agreement $agree")
      verified.get((a, b)).foreach(nEq => assert(nEq == agree))
    }
  }

  test("verified pairs keep genuine near-dups and exact dups on real text") {
    val df = nearDups.toDF("doc_id", "text")
    val v = TextOps.verifiedPairsFromSignatures(
      TextOps.minhashSignatures(df, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(v((1L, 4L)) == 16)                      // exact dup: all components agree
    assert(v.contains((1L, 2L)) && v((1L, 2L)) >= TextOps.verifyMinEqual) // near-dup confirmed
    assert(!v.keySet.exists { case (a, b) => a == 3L || b == 3L }) // unrelated: no pair
  }

  test("maxBucketSize excludes a template-flood bucket from quadratic pair expansion") {
    // 80 identical docs (a scraper flood) + one genuine near-dup pair:
    // the flood shares every band → one 80-member bucket → 3160 pairs
    // from a single task if absorbed
    val flood = (1 to 80).map(i => (i.toLong, baseWords.mkString(" ")))
    val pairWords = (0 until 40).map(i => s"w$i")
    val pairDocs = Seq(
      (100L, pairWords.mkString(" ")),
      (101L, pairWords.updated(20, "CHANGED").mkString(" ")))
    val sigs = TextOps.minhashSignatures((flood ++ pairDocs).toDF("doc_id", "text"),
      "doc_id", "text")
    val uncapped = TextOps.verifiedPairsFromSignatures(sigs, "doc_id")
    assert(uncapped.filter(col("doc_a") < 100).count() == 80L * 79 / 2)
    val capped = TextOps.verifiedPairsFromSignatures(sigs, "doc_id",
      maxBucketSize = Some(40))
    // the flood bucket is excluded wholesale…
    assert(capped.filter(col("doc_a") < 100).count() == 0)
    // …while normal-sized buckets still pair (the genuine near-dup survives)
    assert(capped.filter(col("doc_a") === 100 && col("doc_b") === 101).count() == 1)
  }

  test("simhash: near-identical docs are close in Hamming distance, unrelated far") {
    val df = nearDups.toDF("doc_id", "text")
    val hs = TextOps.simhashTable(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the expression form computes the same hash (small-input path)
    val expr = df.select($"doc_id", TextOps.simhash32(TextOps.tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs == expr)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(4L)) == 0)              // exact dup
    assert(ham(hs(1L), hs(2L)) < ham(hs(1L), hs(3L))) // near-dup closer than unrelated
  }

  test("fingerprint is order-sensitive where bag-of-words is not") {
    val df = Seq(("a b c", 1), ("c b a", 2)).toDF("text", "id")
    val fps = df.select($"id", TextOps.fingerprint(TextOps.tokens($"text")).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(1) != fps(2))
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    val df = Seq(
      ("the cat and the dog of a house", "en"),
      ("der hund und die katze das haus", "de"),
      ("le chat et la maison les arbres", "fr"),
      ("xyzzy plugh quux", "und")).toDF("text", "expected")
    val out = df.select(TextOps.langId(TextOps.tokens($"text")).as("got"), $"expected")
    assert(out.collect().forall(r => r.getString(0) == r.getString(1)))
  }
}
