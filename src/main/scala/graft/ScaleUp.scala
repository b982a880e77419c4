package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a `copies`× benchmark fixture from the driver's sf0.1 parquet
  * (default: sf1.0 at /tmp/graft_sf1.0) so the WHOLE catalog can run one
  * decade up — the driver only ships sf0.001/0.01/0.1, and "the plans
  * look scale-safe" is not a measurement (VERDICT r09 missing #3).
  *
  * Derivation (the round-8 decade recipe, now committed and applied to
  * every table):
  *  - dimensions (`region`, `nation`) copy through unchanged — real
  *    scale-ups grow facts, not the nation list;
  *  - keyed tables union `copies` key-shifted copies (key + c·SPAN for
  *    every entity key, so FK pairs shift in lockstep and every join
  *    yields exactly copies× the matches: orders⨝lineitem on orderkey,
  *    orders⨝customer on custkey, lineitem⨝part/supplier);
  *  - `documents` copy 0 is untouched; copies 1+ append a copy tag to
  *    EVERY word, so no shingle collides across copies while within-copy
  *    dup/near-dup structure is preserved exactly — dedup work scales
  *    copies× without manufacturing cross-copy near-dups (`n_chars`
  *    re-derived from the salted text);
  *  - `embeddings` shift `vec_id` and deterministically jitter one
  *    vec_id-chosen dimension per copy (copy 0 untouched) — clones stay
  *    near their source vector (per-centroid neighborhoods still grow
  *    copies×, fixed-id probe queries in copy 0 stay meaningful) but are
  *    never bit-identical, so band-key/centroid collisions scale like a
  *    real corpus instead of degenerating to exact-twin cliques;
  *  - fixed-id anchors (`CorpusBoundaryId`, KNN query ids, hybrid-search
  *    seeds) all resolve into the intact copy 0, so every catalog row
  *    still computes its real shape — with the one declared caveat that
  *    a CONSTANT corpus boundary means incremental-dedup's corpus side
  *    stays fixed while its batch side scales (the batch side is the
  *    side that shuffles, so the scaling question is still exercised).
  *
  * `events.ts` copies through in whatever physical type the source
  * fixture uses (timestamp[us] currently; raw INT64 nanos under
  * `nanosAsLong` for older fixtures) — [[graft.sources.Tables
  * .normalizeEventTs]] reads either generation identically. */
object ScaleUp {

  /** Key shift per copy — far above every key in the sf0.1 fixture. */
  val Span = 10_000_000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1.0")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val span = args.lift(3).map(_.toLong).getOrElse(Span)
    // optional comma-separated table subset: a fourth-decade fixture for
    // the documents-only kernel rows fits a disk the full fixture won't
    val tables = args.lift(4).map(_.split(",").toSeq).getOrElse(AllTables)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    derive(spark, src, dst, copies, tables = tables, span = span)
    println(s"""{"scaled":"$dst","copies":$copies,"span":$span,"src":"$src",""" +
      s""""tables":"${tables.mkString(",")}"}""")
    spark.stop()
  }

  /** Every table the driver fixture ships. */
  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "embeddings", "documents")

  /** Materialize the `copies`× fixture under `dst` (callable from specs —
    * [[main]] owns the session lifecycle, this does not; `tables` narrows
    * the derivation to a subset when a spec only needs one table).
    *
    * `span` is the per-copy key shift. The default suits a source fixture
    * whose keys all sit below [[Span]] (the driver's sf0.1). Decades are
    * STACKED by re-deriving from an already-derived fixture with a span
    * exceeding its key range (e.g. sf10 holds keys below 100·Span, so
    * sf10 → sf100 uses span = 1e9) — a 10-leg union over the big fixture
    * instead of a 1000-leg union over sf0.1, which keeps the plan (and
    * the documents word-salt expression count) constant per decade. The
    * nested word salt appends a second `zz<c>` tag; tags end in
    * `"zz" + decimal`, so tokens from different outer copies can never
    * collide and within-copy dup structure is still preserved exactly. */
  def derive(spark: SparkSession, src: String, dst: String, copies: Int,
      tables: Seq[String] = AllTables, span: Long = Span): Unit = {
    // this OVERWRITES dst table paths: drop the per-JVM schema/row-count
    // memos so a same-JVM reader of a re-derived path can never see a
    // stale schema or geometry (ADVICE r20 #2 — the seam existed with
    // zero callers; a silent stale-schema read yields nulls, not errors)
    graft.sources.Tables.invalidateSchemas()
    graft.operators.AnnGeometry.invalidateCounts()
    def write(name: String)(xform: (DataFrame, Int) => DataFrame): Unit =
      if (tables.contains(name)) {
        val base = spark.read.parquet(s"$src/$name.parquet")
        (0 until copies).map(c => xform(base, c))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      }
    def shifted(keys: String*)(df: DataFrame, c: Int): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * span)))

    // dimensions: one copy, no shift
    Seq("region", "nation").filter(tables.contains).foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    write("customer")(shifted("c_custkey"))
    write("supplier")(shifted("s_suppkey"))
    write("part")(shifted("p_partkey"))
    write("orders")(shifted("o_orderkey", "o_custkey"))
    write("lineitem")(shifted("l_orderkey", "l_partkey", "l_suppkey"))
    write("events")(shifted("event_id", "user_id"))
    write("embeddings") { (df, c) =>
      val s = shifted("vec_id")(df, c)
      // Copies 1+ are JITTERED, not bit-identical (VERDICT r15 missing
      // #2: clone-degenerate embeddings gave every vector 10^4 exact
      // twins sharing all RP-LSH band keys, which made semdedup_ann's
      // candidate self-join degenerate-quadratic and skewed the IVF
      // spill rows — a shape no real corpus has). One dimension, chosen
      // by the copy's own vec_id, gets +tag·1e-4: clones stay in the
      // source vector's neighborhood (near-dups, the honest shape) but
      // never collide bit-for-bit (offsets are ≥800 ulps apart at
      // |x|≤1, and the max stacked tag 9999 keeps the shift ≤1.0 — a
      // single-dim perturbation, not a new vector). The tag scales
      // with span/Span like the documents word salt, so STACKED
      // derivations offset from disjoint ranges: inner tags 1..N-1,
      // outer tags N, 2N, … — a (sum, dim) collision would need the
      // same total offset at the same dimension, and dims differ per
      // copy too (span % 96 ≠ 0). Deterministic end to end: rebuilding
      // a fixture is bit-identical, and the oracle reads the same
      // parquet, so nothing to recompute.
      val tag = c * (span / Span)
      if (c == 0) s
      else s.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("vec_id"), size(col("embedding"))),
            x + lit((tag * 1e-4).toFloat)).otherwise(x)))
    }
    write("documents") { (df, c) =>
      val s = shifted("doc_id")(df, c)
      // Tag number scales with span/Span so stacked derivations salt from
      // disjoint number ranges: a source built with N copies holds tags
      // zz1..zz(N-1), and a re-derivation over it uses span = N·Span, so
      // its tags zzN, zz2N, … can never reproduce an inner tag (the
      // inner copy 0 is UNSALTED — with a plain `c` tag, outer copy 1's
      // salt of inner 0 would equal inner copy 1's existing text).
      val tag = c * (span / Span)
      if (c == 0) s
      else s
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"zz$tag"))), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
  }
}
