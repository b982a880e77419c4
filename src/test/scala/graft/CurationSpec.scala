package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, TextOps}

/** Curate semantics on crafted documents — positive AND negative cases
  * for every rule/flag the random driver corpus can't guarantee. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def withRules(docs: Seq[(Long, String)]) = {
    val cols = Curate.gopherRules(TextOps.tokens($"text"))
      .map { case (n, c) => c.as(n) }
    docs.toDF("doc_id", "text").select($"doc_id" +: cols: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("gopher rules: each rule rejects its own failure mode, prose passes") {
    val prose = ("the quick brown fox jumps over a lazy dog and runs to " +
      "the hills in a long morning walk that keeps going for a while").trim
    val rows = withRules(Seq(
      1L -> prose,                                  // passes all
      2L -> "the a of",                             // too short → r_len fails
      3L -> (Seq.fill(25)("pneumonoultramicroscopic").mkString(" ") +
        " the a of and to in"),                     // mean word len > 10
      4L -> (0 until 30).map(i => s"tok$i").mkString(" "))) // no stopwords
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("r_len") && !rows(2L).getAs[Boolean]("keep"))
    assert(rows(2L).getAs[Boolean]("r_stop")) // has 'the','a' → stop rule still passes
    assert(!rows(3L).getAs[Boolean]("r_wordlen"))
    assert(!rows(4L).getAs[Boolean]("r_stop"))
    assert(rows(4L).getAs[Int]("n_stop_distinct") == 0)
  }

  test("n_stop_distinct counts DISTINCT stopwords, not occurrences") {
    val rows = withRules(Seq(5L -> "the the the the the the"))
    assert(rows(5L).getAs[Int]("n_stop_distinct") == 1)
  }

  test("repetition profile: shares and ratios on a crafted repetitive doc") {
    val df = Seq(
      (1L, "a a a a b"),            // 5 words, 2 distinct, top word 4, grams: "a a"×3, "a b"×1
      (2L, "w x y z")               // all distinct
    ).toDF("doc_id", "text")
    val m = Curate.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_words") == 5 && r1.getAs[Long]("n_distinct") == 2)
    assert(r1.getAs[Double]("distinct_ratio") == 0.4)
    assert(r1.getAs[Double]("top_word_share") == 0.8)
    assert(r1.getAs[Double]("top_gram_share") == 0.75)
    val r2 = m(2L)
    assert(r2.getAs[Double]("distinct_ratio") == 1.0)
    assert(r2.getAs[Double]("top_word_share") == 0.25)
  }

  test("repetition profile: native term_profile kernel == exploded relational twin") {
    // real fixture docs + crafted edges (repetition, all-distinct,
    // single word → whole-doc gram, multi-space survivors of trim)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
      .union(Seq((900001L, "a a a a b", "en", "crafted", 9L),
        (900002L, "solo", "en", "crafted", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val native = Curate.repetitionProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val exploded = Curate.repetitionProfileExploded(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(native.length == exploded.length)
    native.zip(exploded).foreach { case (a, b) =>
      assert(a == b, s"kernel diverged from relational twin: $a vs $b") }
    // plan shape: the native form is a narrow projection — NO exchange
    // (checked on a plain scanless frame so only the operator's own
    // shape is in the plan)
    val plan = Curate.repetitionProfile(
        Seq((1L, "a b a")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "term_profile form must not shuffle (that is its whole point)")
  }

  test("decontaminate: flags only docs sharing a full n-gram with the benchmark") {
    val words = (0 until 20).map(i => s"w$i")
    val bench = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq(
      // doc 1 contains words 5..9 verbatim → shares 5-grams
      (1L, ("x y z " + words.slice(5, 12).mkString(" ") + " q r").trim),
      // doc 2 uses benchmark words but never 5 consecutively
      (2L, words.grouped(3).map(_.mkString(" ")).mkString(" BREAK ")),
      (3L, "totally unrelated text about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val m = Curate.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("contaminated") && m(1L).getAs[Long]("n_hits") == 3)
    assert(!m(2L).getAs[Boolean]("contaminated"))
    assert(!m(3L).getAs[Boolean]("contaminated") && m(3L).getAs[Long]("n_hits") == 0)
  }

  test("domain mix: rate 100 keeps everything, weights are inverse rates, deterministic") {
    val df = (0L until 200L).map(i => (i, if (i < 100) "keep_all" else "half"))
      .toDF("doc_id", "source")
    val rate = when($"source" === "keep_all", 100).otherwise(50)
    val out = Curate.domainMix(df, "doc_id", rate)
    val bySrc = out.groupBy($"source").agg(count(lit(1)).as("n"),
        first($"weight").as("w")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(bySrc("keep_all")._1 == 100 && bySrc("keep_all")._2 == 1.0)
    assert(bySrc("half")._1 > 20 && bySrc("half")._1 < 80) // hash-mod, not exact
    assert(bySrc("half")._2 == 2.0)
    // determinism: second run keeps the identical doc set
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Curate.domainMix(df, "doc_id", rate)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
  }

  test("globalRank: two-phase rank equals the local total-order rank") {
    val data = (1 to 500).map(i => (i.toLong, i * 37 % 100))
    val expected = data.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _), ix) => id -> (ix + 1L) }.toMap
    // input partitioning must not matter — offsets compensate
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("id", "score").repartition(parts)
      val out = Curate.globalRank(df, "r", col("score").asc, col("id").asc)
        .select($"id", $"r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"rank diverged at input parts=$parts")
    }
  }

  test("topKPerKey as stratified sampler: exactly K per stratum, all of smaller strata") {
    import graft.operators.Vectors
    // stratum A: 10 docs, stratum B: 2 docs (< K) — B must keep both
    val docs = ((1 to 10).map(i => (i.toLong, "A")) ++ Seq((11L, "B"), (12L, "B")))
      .toDF("doc_id", "stratum")
      .withColumn("h", graft.queries.hash60(concat(lit("eval:"), $"doc_id".cast("string"))))
    val out = Vectors.topKPerKey(docs, $"stratum", $"h", $"doc_id", 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3)))
    val byStratum = out.groupBy(_._1)
    assert(byStratum("A").length == 3 && byStratum("B").length == 2)
    // ranks are 1..n within each stratum, deterministic across runs
    assert(byStratum("A").map(_._3).sorted.sameElements(Seq(1, 2, 3)))
    val again = Vectors.topKPerKey(docs.repartition(7), $"stratum", $"h", $"doc_id", 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
    assert(again == out.toSet)
  }

  test("pii scrub: emails and phones are replaced, counts audited pre-replacement") {
    val df = Seq(
      (1L, "reach me at alice.smith+work@sub.example.co.uk or +1-800-555-0199 thanks"),
      (2L, "two mails a@b.io c@d.org and no phone"),
      (3L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val cols = Curate.scrubPii($"text").map { case (n, c) => c.as(n) }
    val m = df.select($"doc_id" +: cols: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Int]("n_emails") == 1 && m(1L).getAs[Int]("n_phones") == 1)
    assert(m(1L).getAs[String]("clean") == "reach me at <EMAIL> or <PHONE> thanks")
    assert(m(2L).getAs[Int]("n_emails") == 2)
    assert(m(2L).getAs[String]("clean").contains("<EMAIL> <EMAIL>"))
    assert(m(3L).getAs[String]("clean") == "clean text with no pii at all")
    // nothing PII-shaped survives any scrub
    val survivors = df.select(Curate.scrubPii($"text").last._2.as("clean"))
      .filter(col("clean").rlike(Curate.EmailRe) || col("clean").rlike(Curate.PhoneRe))
    assert(survivors.count() == 0)
  }

  test("broadcast ceiling enforced in code: oversized side loses the hint, results unchanged") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val corpus = docs.filter($"doc_id" % 50 =!= 0)
    val bench = docs.filter($"doc_id" % 50 === 0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // auto-broadcast off: any broadcast in the initial plan is the HINT's
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = Curate.decontaminate(corpus, bench, "doc_id", "text")
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "within the ceiling, the benchmark gram set must keep its broadcast hint")
      // ceiling of 0 bytes simulates a benchmark set past the ceiling
      val unhinted = Curate.decontaminate(corpus, bench, "doc_id", "text",
        maxBroadcastBytes = 0L)
      val p = unhinted.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"past the ceiling the hint must drop:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"past the ceiling the probe must degrade to a shuffled join:\n$p")
      // identical rows either way
      assert(hinted.except(unhinted).isEmpty && unhinted.except(hinted).isEmpty,
        "ceiling fallback changed decontamination results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fixture guards: pass on the real fixture, fail loudly on every drift mode") {
    import graft.queries.FixtureGuards
    // the real fixture passes (this is what Verify runs once per session)
    FixtureGuards.check(spark, "/root/testdata/sf0.001")
    val boundary = graft.queries.LlmOps.CorpusBoundaryId
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "source")
    val ok = (0L, "src0") :: (boundary, "src5") :: Nil
    FixtureGuards.checkDocs(docs(ok: _*))
    // drift 1: a source index beyond 24 → rate ≤ 0
    intercept[IllegalArgumentException] {
      FixtureGuards.checkDocs(docs((0L, "src30"), (boundary, "src0")))
    }
    // drift 2 (ADVICE r07): a source WITHOUT trailing digits → null rate,
    // previously invisible to min/max, now a counted failure
    intercept[IllegalArgumentException] {
      FixtureGuards.checkDocs(docs((0L, "web"), (boundary, "src0")))
    }
    // drift 3: all ids on one side of the incremental boundary
    intercept[IllegalArgumentException] {
      FixtureGuards.checkDocs(docs((0L, "src0"), (1L, "src1")))
    }
    intercept[IllegalArgumentException] {
      FixtureGuards.checkDocs(docs((boundary, "src0"), (boundary + 1, "src1")))
    }
    // drift 4 (embeddings): ids not starting at 0, or too few vectors,
    // would make the ANN query/benchmark sets silently empty
    def embs(ids: Long*) = ids.map(i => (i, Array(0.1f))).toDF("vec_id", "embedding")
    FixtureGuards.checkEmbeddings(embs(0L until 100L: _*))
    intercept[IllegalArgumentException] {
      FixtureGuards.checkEmbeddings(embs(1000L until 1100L: _*))
    }
    intercept[IllegalArgumentException] {
      FixtureGuards.checkEmbeddings(embs(0L until 50L: _*))
    }
  }
}
