package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Pins the [[ScaleUp]] derivation invariants the decade measurement
  * depends on (PERF.md): the scaled fixture must grow WORK linearly
  * without changing the SHAPE of any query's answer distribution.
  *
  *  - facts grow exactly `copies`×; dimensions do not grow at all;
  *  - FK pairs shift in lockstep, so every catalog join yields exactly
  *    `copies`× the base matches — no cross-copy match can exist
  *    (keys within a copy are < Span apart; shifts differ by ≥ Span);
  *  - document texts are salted per copy: distinct texts grow exactly
  *    `copies`× (zero cross-copy shingle/text collisions) while the
  *    within-copy duplicate-group histogram is preserved per copy —
  *    dedup work scales without manufacturing near-dups;
  *  - the derived fixture reads back through the SAME [[Tables]] entry
  *    points the catalog uses (the events nanos round-trip included).
  */
class ScaleUpSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.derive(spark, src, d, copies = 3)
    d
  }
  private val copies = 3

  test("facts grow copies-x; dimensions are untouched") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "embeddings", "documents")) {
      val base = spark.read.parquet(s"$src/$t.parquet").count()
      val big = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(big == base * copies, s"$t: $big != $copies x $base")
    }
    for (t <- Seq("region", "nation")) {
      val base = spark.read.parquet(s"$src/$t.parquet").count()
      val big = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(big == base, s"$t: dimension grew $base -> $big")
    }
  }

  test("FK lockstep: joins yield exactly copies-x the base matches") {
    def joinCount(dir: String): (Long, Long) = {
      val o = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      val c = Tables.customer(spark, dir)
      (li.join(o, li("l_orderkey") === o("o_orderkey")).count(),
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    }
    val (bLi, bCust) = joinCount(src)
    val (sLi, sCust) = joinCount(dst)
    assert(sLi == bLi * copies, s"orders-lineitem: $sLi != $copies x $bLi")
    assert(sCust == bCust * copies, s"orders-customer: $sCust != $copies x $bCust")
  }

  test("documents: distinct texts grow exactly copies-x (no cross-copy collisions)") {
    val base = spark.read.parquet(s"$src/documents.parquet")
    val big = spark.read.parquet(s"$dst/documents.parquet")
    assert(big.select("text").distinct().count() ==
      base.select("text").distinct().count() * copies)
  }

  test("documents: within-copy duplicate-group histogram preserved per copy") {
    // sf0.001/sf0.01 documents are dup-free, so the histogram check would
    // be vacuous there — derive documents only from sf0.1 (8 dup rows)
    val dupSrc = "/root/testdata/sf0.1"
    val dupDst = java.nio.file.Files.createTempDirectory("graft_scaleup_doc").toString
    ScaleUp.derive(spark, dupSrc, dupDst, copies, tables = Seq("documents"))
    val base = spark.read.parquet(s"$dupSrc/documents.parquet")
    def histogram(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy("text").count().groupBy("count").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseHist = histogram(base)
    // the fixture must contain real dup groups or this test proves nothing
    assert(baseHist.keys.exists(_ > 1), "sf0.1 documents has no exact dups")
    val big = spark.read.parquet(s"$dupDst/documents.parquet")
      .withColumn("copy", floor(col("doc_id") / ScaleUp.Span))
    for (c <- 0 until copies) {
      val h = histogram(big.where(col("copy") === c).drop("copy"))
      assert(h == baseHist, s"copy $c histogram $h != base $baseHist")
    }
    // n_chars stays consistent with the salted text (catalog queries
    // derive length stats from it)
    assert(big.where(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("stacked derivation: re-deriving with a wider span composes decades") {
    // sf100 is built sf10 -> x10 with span above the source's key range
    // (a 10-leg union per decade instead of a 1000-leg union from sf0.1);
    // the composed fixture must look exactly like a direct copies^2 one:
    // facts x9, joins in lockstep, zero cross-copy text collisions.
    val d2 = java.nio.file.Files.createTempDirectory("graft_scaleup2").toString
    ScaleUp.derive(spark, dst, d2, copies, span = ScaleUp.Span * copies)
    for (t <- Seq("lineitem", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$src/$t.parquet").count()
      assert(spark.read.parquet(s"$d2/$t.parquet").count() == base * copies * copies)
    }
    val o = Tables.orders(spark, d2)
    val li = Tables.lineitem(spark, d2)
    val baseJoin = Tables.lineitem(spark, src).join(Tables.orders(spark, src),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(li.join(o, li("l_orderkey") === o("o_orderkey")).count() ==
      baseJoin * copies * copies, "stacked FK shift broke join lockstep")
    val docs = spark.read.parquet(s"$d2/documents.parquet")
    assert(docs.select("text").distinct().count() ==
      spark.read.parquet(s"$src/documents.parquet").select("text").distinct().count()
        * copies * copies, "stacked word salt collided across copies")
  }

  test("derived fixture reads through the catalog's Tables entry points") {
    val ev = Tables.events(spark, dst)
    assert(ev.count() == Tables.events(spark, src).count() * copies)
    assert(ev.schema == Tables.events(spark, src).schema)
    val emb = Tables.embeddings(spark, dst)
    assert(emb.select("vec_id").distinct().count() ==
      Tables.embeddings(spark, src).select("vec_id").distinct().count() * copies)
    // clones are JITTERED (round 16): every copy is a distinct vector —
    // bit-identical clones made ANN self-joins degenerate-quadratic
    assert(emb.select("embedding").distinct().count() ==
      Tables.embeddings(spark, src).select("embedding").distinct().count() * copies)
  }

  test("embedding jitter: copies stay in the source neighborhood, copy 0 intact") {
    val src0 = Tables.embeddings(spark, src)
      .select(col("vec_id"), col("embedding").as("e0"))
    val emb = Tables.embeddings(spark, dst)
    // copy 0 is byte-identical to the source
    assert(emb.join(src0, "vec_id")
      .where(col("embedding") =!= col("e0")).count() == 0)
    // every clone differs from its source in EXACTLY one dimension, by
    // its copy tag x 1e-3 — near-dup, never exact-dup
    val clones = emb.where(col("vec_id") >= ScaleUp.Span)
      .withColumn("src_id", pmod(col("vec_id"), lit(ScaleUp.Span)))
      .join(src0.withColumnRenamed("vec_id", "src_id"), "src_id")
    assert(clones.count() > 0)
    val diffDims = clones.select(
      aggregate(zip_with(col("embedding"), col("e0"),
          (a, b) => when(a =!= b, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).as("nd"))
    assert(diffDims.where(col("nd") =!= 1).count() == 0,
      "each clone must differ from its source in exactly one dimension")
  }
}
