package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned Bloom filter over a content-hash set — the cheap first
  * gate in front of the exact incremental-dedup anti-join.
  *
  * Why: the bucketed corpus hash index ([[DedupIndex]]) already makes the
  * exact gate scale-safe (sort-merge, corpus never moves), but every
  * batch row still pays the probe shuffle. A Bloom sidecar is ~25×
  * smaller than the hash set itself (10 bits vs 32 bytes per document)
  * and has NO false negatives, so rows the filter rejects are *provably
  * new* and skip the anti-join entirely; only the colliding fraction
  * (true duplicates + ~1% false positives) reaches the exact join, which
  * then removes the false positives. Output is therefore IDENTICAL to
  * the exact path — `incremental_dedup_bloom` shares `incremental_dedup`'s
  * oracle SQL verbatim — while the expensive probe processes a sliver of
  * the batch.
  *
  * Why PARTITIONED (one bitset per bucket, not one global filter): Bloom
  * bits are corpus-proportional (sublinear constant, but linear growth) —
  * 10 bits × 10^10 docs ≈ 12.5 GB, far past any broadcast/driver budget,
  * which is how `DataFrameStatFunctions.bloomFilter` (driver-collected)
  * dies at scale. Sharding the bitset across `buckets` rows keyed by a
  * hash of the element lets the probe be a plain equi-join on `bucket`:
  * AQE broadcasts the table while it is small and shuffle-joins it once
  * it is not, each task receiving only its buckets' slices. No static
  * broadcast hint anywhere (the VERDICT r07 rule: never hint a side that
  * grows with the corpus).
  *
  * Determinism: membership bits use `xxhash64` double hashing
  * (idx_i = h1 + i·h2 mod m). Engine-internal hashing is fine here — the
  * filter only routes rows between the skip path and the exact join; the
  * RESULT is hash-independent, so the DuckDB oracle never needs to
  * reproduce the Bloom.
  */
object HashBloom {

  /** Probes per element. With ~10 bits/element, k=5 gives fpp ≈ 1%. */
  val Probes = 5

  /** Bits budgeted per expected element (m = n·bitsPerElem / buckets). */
  val BitsPerElem = 10

  private def h1(h: Column): Column = xxhash64(h)
  private def h2(h: Column): Column = xxhash64(lit("graft-bloom-2"), h)
  private def bucketOf(h: Column, buckets: Int): Column =
    pmod(xxhash64(lit("graft-bloom-b"), h), lit(buckets.toLong)).cast("int")

  /** i-th double-hashed bit index, ANSI-safe: both hashes are reduced
    * mod `m` BEFORE the i-multiply/add (full-range 64-bit hashes would
    * overflow long under ANSI arithmetic; i·(m−1)+(m−1) never does for
    * any real filter width). Build and probe both derive indices from
    * this one function — the formula IS the filter format. */
  private def bitIdx(h: Column, i: Int, m: Column): Column =
    pmod(pmod(h1(h), m) + lit(i.toLong) * pmod(h2(h), m), m)

  /** Build the sharded filter from a hash-set frame: one row per bucket,
    * `(bucket: int, bits: array<long>)`. All buckets share one width `m`
    * (derived from the element count — the build's single bounded driver
    * action, like every other artifact build); probes recover `m` from
    * `size(bits)` per row, so the table is self-describing. The build is
    * two narrow-ish aggregations (hash → k bit positions → per-word OR →
    * per-bucket assembly); it runs once per corpus fingerprint. */
  def build(hashes: DataFrame, hashCol: String, buckets: Int,
      bitsPerElem: Int = BitsPerElem, k: Int = Probes): DataFrame = {
    require(buckets > 0, s"buckets=$buckets")
    val n = hashes.count()
    val perBucketBits = math.max(1024L, n * bitsPerElem / buckets)
    val words = ((perBucketBits + 63) / 64).toInt
    buildAt(hashes, hashCol, buckets, words * 64L, k)
  }

  /** Width (bits per bucket) of an existing filter — from one row, the
    * table being self-describing (bounded driver action). [[build]]
    * emits one row per bucket even for an empty input set, so a built
    * filter always answers; an empty FRAME here means the caller
    * filtered the table away — a diagnosable error, not a crash. */
  def widthOf(bloom: DataFrame): Long =
    bloom.select(size(col("bits"))).head(1) match {
      case Array(r) => r.getInt(0) * 64L
      case _ => throw new IllegalArgumentException(
        "empty bloom table (no bucket rows): build() always writes one " +
          "row per bucket — was this frame filtered before use?")
    }

  /** Bucket count of an existing filter — the table carries exactly one
    * row per bucket by construction, so the count IS the geometry (and
    * probing with any other count would manufacture false negatives). */
  def bucketsOf(bloom: DataFrame): Int = bloom.count().toInt

  /** Absorb new hashes into an existing filter: build a delta at the
    * SAME geometry (the existing width — indices are width-dependent,
    * so any other m would scatter bits that [[withMaybe]] then cannot
    * find) and OR it in per bucket.
    *
    * This is the lockstep-maintenance half of the no-false-negative
    * invariant: a Bloom filter can never un-say "absent", so a sidecar
    * left STALE while its hash set absorbs batches tells the gate that
    * freshly absorbed documents are provably new — their redelivery
    * then BYPASSES the exact anti-join and lands duplicates (the spec
    * demonstrates exactly this). Whoever appends to the hash table
    * must `add` the same hashes here in the same maintenance window —
    * the [[graft.sources.DedupIndex]] stamped artifacts sidestep it by
    * being frozen per corpus fingerprint; a user-owned evolving index
    * must not. Widths never change under `add`; when the element count
    * outgrows the built width (fpp climbs toward 1 and the gate decays
    * to "everything maybe" — safe, just useless), rebuild at the new
    * count like any Bloom deployment. */
  def add(bloom: DataFrame, newHashes: DataFrame, hashCol: String,
      buckets: Int, k: Int = Probes, width: Long = -1L): DataFrame = {
    // width from the caller's metadata when known (no head() probe);
    // derived from the frame otherwise
    val m = if (width > 0) width else widthOf(bloom)
    val delta = buildAt(newHashes, hashCol, buckets, m, k)
    bloom.select(col("bucket"), col("bits").as("_ob"))
      .join(delta.select(col("bucket"), col("bits").as("_db")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        when(col("_ob").isNull, col("_db"))
          .when(col("_db").isNull, col("_ob"))
          .otherwise(zip_with(col("_ob"), col("_db"),
            (a, b) => a.bitwiseOR(b))).as("bits"))
  }

  private def buildAt(hashes: DataFrame, hashCol: String, buckets: Int,
      m: Long, k: Int): DataFrame = {
    val words = (m / 64).toInt
    val h = col(hashCol)
    val idx = explode(array((0 until k).map(i =>
      bitIdx(h, i, lit(m))): _*)).as("idx")
    // dense assembly, LINEAR in filter width: the per-bucket (word, w)
    // pairs are collected SORTED and walked once, each pair emitting the
    // zero-run from the previous pair's word plus its own word — O(1)
    // try_element_at array probes, O(words) total. The previous form
    // built a per-bucket MAP and probed it once per index; element_at on
    // a Catalyst map is a linear key scan, so assembly was O(words²) per
    // bucket — invisible at sf0.1 (~300 words/bucket), ~10¹¹ comparisons
    // per bucket at sf1000 (488 k words), where the round-15 A/B build
    // sat for 45 minutes in one task before being killed (PERF.md r15).
    val built = hashes
      .select(bucketOf(h, buckets).as("bucket"), idx)
      .select(col("bucket"), (col("idx") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pmod(col("idx"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("bucket"), col("word"))
      .agg(bit_or(col("bit")).as("w"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("word"), col("w")))).as("ps"))
      .select(col("bucket"), {
        val ps = col("ps")
        def prevWord(i: Column) = when(i === 0, lit(-1))
          .otherwise(try_element_at(ps, i).getField("word"))
        val body = flatten(transform(ps, (p, i) =>
          concat(
            array_repeat(lit(0L), p.getField("word") - prevWord(i) - lit(1)),
            array(p.getField("w")))))
        val lastWord =
          coalesce(try_element_at(ps, size(ps)).getField("word"), lit(-1))
        concat(body,
          array_repeat(lit(0L), lit(words) - lastWord - lit(1))).as("bits")
      })
    // skeleton join: EVERY bucket gets a row, elements or not — an empty
    // or sparse build yields all-zero bitsets (probe = provably absent,
    // correct for an empty set) instead of missing rows that crash
    // widthOf/bucketsOf and force null-handling on every probe
    hashes.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
      .join(built, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("bits"),
          array_repeat(lit(0L), words)).as("bits"))
  }

  /** Annotate `df` with a `_maybe` column: true iff the filter MIGHT
    * contain the row's hash (false ⇒ provably absent from the built set).
    * Pure column algebra after one equi-join on the bucket key — the k
    * bit tests are unrolled into a codegen'd conjunction; `m` comes from
    * `size(bits)` so no driver action, no config coupling. A bucket with
    * no filter row (possible only for an empty build) probes false.
    * Internals ride on `_bloom_`-prefixed columns so a caller frame that
    * legitimately carries `bucket`/`bits` columns passes through
    * untouched (same convention as `_h`/`_maybe`). */
  def withMaybe(df: DataFrame, bloom: DataFrame, hashCol: String,
      buckets: Int, k: Int = Probes): DataFrame = {
    val h = col(hashCol)
    val bloomSide = bloom.select(col("bucket").as("_bloom_bucket"),
      col("bits").as("_bloom_bits"))
    val m = size(col("_bloom_bits")).cast("long") * 64L
    val tests = (0 until k).map { i =>
      val idx = bitIdx(h, i, m)
      (call_function("shiftright",
        element_at(col("_bloom_bits"), (idx / 64).cast("int") + 1),
        pmod(idx, lit(64L)).cast("int")).bitwiseAND(lit(1L)) === 1L)
    }
    df.withColumn("_bloom_bucket", bucketOf(h, buckets))
      .join(bloomSide, Seq("_bloom_bucket"), "left")
      .withColumn("_maybe", col("_bloom_bits").isNotNull && tests.reduce(_ && _))
      .drop("_bloom_bucket", "_bloom_bits")
  }
}
