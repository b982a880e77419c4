package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.hash60

/** Text-analysis / dedup primitives for LLM-training-data pipelines
  * (builder brief; SURVEY §7.2 step 7): tokenization, shingling, MinHash
  * signatures + LSH banding, SimHash, rolling fingerprints, quality stats.
  *
  * Everything is a pure Column expression (codegen'd, no UDFs, no shuffle)
  * built on the portable [[graft.queries.hash60]] md5 hash so every
  * operator has a bit-identical DuckDB oracle. Per-doc cost is linear in
  * token count; nothing here collects or groups — callers decide the
  * shuffle (e.g. groupBy(band_key) for LSH bucketing), which keeps the
  * 100 TB plan: hash-partition by bucket, never all-pairs.
  */
object TextOps {

  /** Mersenne prime 2^31-1 — modulus for MinHash permutations and
    * fingerprints; keeps `a*h+b` within long range. */
  val P: Long = 2147483647L

  /** Fixed MinHash permutation constants (k=16): h_i(x) = (a_i·x + b_i) mod P.
    *
    * The coefficients must be LARGE (uniform in [1, P)): an earlier
    * revision used tiny primes (7..67), and the `pair_jaccard`
    * calibration row caught the consequence — with a small multiplier,
    * a·h+b is near-monotone in h, so every permutation tends to pick the
    * SAME low-hash shingle as its minimum. Two documents sharing one
    * low-valued shingle hash then agree on many signature components at
    * once (measured: a single shared shingle out of ~100 → 16/16
    * agreement, i.e. "exact duplicate", at true Jaccard 0.01; at sf0.01,
    * 11 of 36 gate-passing pairs had exact J < 0.5). Large multipliers
    * decorrelate the permutations, restoring E[agreement/k] = J — the
    * property the verification gate and the banding math assume.
    * Values are fixed (seeded once, hardcoded) so every signature, band
    * key, and DuckDB oracle stays deterministic; a·h+b ≤ maxA·(P-1)+maxB
    * < 2^62 stays inside signed-64 math in both engines. */
  val minhashA: Seq[Long] = Seq(
    1373158607L, 239081664L, 53710185L, 1592467582L, 590620972L,
    525901257L, 479341424L, 299655413L, 1581559893L, 220106708L,
    1453201079L, 1590571866L, 1915941033L, 1171165723L, 186699714L,
    1268073013L)
  val minhashB: Seq[Long] = Seq(
    906070220L, 68252793L, 63989047L, 201209005L, 469521477L,
    499635468L, 1085242216L, 1292825378L, 56985561L, 1205264595L,
    427000596L, 1537640408L, 1395616196L, 1506083910L, 1170252923L,
    900911954L)
  /** 4 bands × 4 rows over the 16-element signature. */
  val bands = 4
  val rowsPerBand = 4

  /** In-bucket verification threshold: a band-colliding pair is a real
    * near-duplicate only if at least this many of the 16 signature
    * components agree (component-agreement fraction is an unbiased
    * estimator of Jaccard similarity, so 8/16 ≈ Jaccard ≥ 0.5). LSH bands
    * are precision-LOSING by design — at corpus scale, band collisions
    * between genuinely distinct documents are routine, and an unverified
    * drop deletes training data. Every clustering/dedup path therefore
    * gates candidates through [[sigAgreement]] ≥ this before dropping. */
  val verifyMinEqual = 8

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** `n`-word shingles ("w1 w2 w3" strings); docs shorter than `n` words
    * collapse to a single whole-doc shingle. */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Shingle hashes reduced mod P — computed ONCE, shared by all k
    * permutations (md5 per shingle, not per shingle×permutation). */
  def shingleHashes(sh: Column): Column =
    transform(sh, x => pmod(hash60(x), lit(P)))

  /** The k MinHash signature values for pre-hashed shingles. */
  def minhashSig(hashes: Column): Seq[Column] =
    minhashA.zip(minhashB).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(lit(a) * h + lit(b), lit(P))))
    }

  /** LSH band keys: hash of each band's concatenated signature rows.
    * Equal band_key within a band ⇒ candidate near-duplicate pair. */
  def bandKeys(sig: Seq[Column], hashFn: Column => Column = hash60): Seq[Column] =
    (0 until bands).map { j =>
      val rows = sig.slice(j * rowsPerBand, (j + 1) * rowsPerBand)
      hashFn(concat_ws("_", rows.map(_.cast("string")): _*))
    }

  /** The MinHash band table: per-row signature kernel → 4 band keys →
    * one row per (doc, band). Near-dup candidates then come from a
    * shuffle on (band, band_key), never from comparing docs pairwise.
    *
    * `useXx = false` (default) hashes shingles with the portable md5
    * [[hash60]] (oracle-checkable); `true` uses native xxhash64 — no
    * cryptographic digest per shingle (the `*_xx` bench variants
    * quantify the md5 tax). The band keys use the matching hash. */
  def minhashBandTable(df: DataFrame, idCol: String, textCol: String,
      useXx: Boolean = false, keepKeyPrefix: Boolean = false): DataFrame =
    bandTableFromSignatures(minhashSignatures(df, idCol, textCol, useXx), idCol,
      if (useXx) xxhash64(_) else hash60, keepKeyPrefix = keepKeyPrefix)

  /** The k=16 MinHash signature per document, as (idCol, sig: array<long>)
    * — the reusable middle stage of [[minhashBandTable]], exposed so
    * verification ([[sigAgreement]]) can reuse the SAME signature subtree
    * the band keys were derived from (one signature computation per plan,
    * never one per consumer).
    *
    * Backed by the per-row [[graft.functions.MinhashSig]] kernel: a
    * narrow zero-exchange projection (no shingle explosion, no 16-column
    * hash aggregate — the exploded twin's agg map was the residual
    * signature-stage spill at the r11 sf100 run). Output is bit-identical
    * to [[minhashSignaturesExploded]] (MinhashKernelSpec differential);
    * the null-text coalesce reproduces the exploded form's
    * whole-doc-empty-shingle behavior for null docs. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      useXx: Boolean = false): DataFrame =
    df.select(col(idCol),
      call_function(if (useXx) "minhash_sig_xx" else "minhash_sig",
        coalesce(tokens(col(textCol)), array(lit("")))).as("sig"))

  /** The relational twin of [[minhashSignatures]] — explode shingle
    * start positions → hash once per shingle → 16 codegen'd `min`
    * partial aggregates per doc. Retained as the differential oracle for
    * the kernel (MinhashKernelSpec pins kernel == exploded on fixture
    * and edge docs, both hashes) and as the shape a plain-Spark user
    * would write: map-side combine keeps its shuffle narrow (16 longs
    * per doc), but the aggregation map holds every in-flight doc's state
    * per task — measurably spill-bound at corpus scale, which is why the
    * kernel form is the production path. */
  def minhashSignaturesExploded(df: DataFrame, idCol: String, textCol: String,
      hashFn: Column => Column = hash60): DataFrame = {
    // shingle construction stays OUT of higher-order lambdas: explode the
    // START POSITIONS (one codegen'd sequence per doc) and build each
    // 3-gram with element_at/concat_ws — all codegen'd — instead of
    // `transform(..., slice+concat)` which interprets one lambda call per
    // shingle (~1M interpreted evals at sf0.1). Position -1 marks the
    // whole-doc shingle for docs shorter than 3 words. Emits the exact
    // same shingle strings as [[shingles]] (PropertySpec pins this), so
    // hashes, signatures, and the DuckDB oracle are unchanged.
    val n = 3
    val posed = df
      .select(col(idCol).as("_mh_id"), tokens(col(textCol)).as("_toks"))
      .select(col("_mh_id"), col("_toks"),
        explode(when(size(col("_toks")) >= n, sequence(lit(0), size(col("_toks")) - n))
          .otherwise(array(lit(-1)))).as("_i"))
    val shingle = when(col("_i") >= 0,
      concat_ws(" ", (1 to n).map(k => element_at(col("_toks"), col("_i") + k)): _*))
      .otherwise(concat_ws(" ", col("_toks")))
    val hashed = posed
      .select(col("_mh_id"), pmod(hashFn(shingle), lit(P)).as("h"))
    val sigAggs = minhashA.zip(minhashB).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"s$i")
    }
    hashed.groupBy(col("_mh_id")).agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("_mh_id").as(idCol),
        array((0 until minhashA.size).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** One row per (id, n-gram hash) — the codegen'd gram generator shared
    * by decontamination and the dedup family's candidate paths: explode
    * the START POSITIONS (one `sequence` per doc) and build each n-gram
    * with element_at/concat_ws, all whole-stage-codegen'd (same shape and
    * rationale as [[minhashSignatures]]'s shingle stage). Docs shorter
    * than `n` words collapse to a single whole-doc gram (position -1).
    * Narrow until the caller decides the shuffle. */
  def ngramHashRows(df: DataFrame, idCol: String, textCol: String, n: Int,
      hashFn: Column => Column = hash60): DataFrame = {
    val posed = df
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        explode(when(size(col("_toks")) >= n, sequence(lit(0), size(col("_toks")) - n))
          .otherwise(array(lit(-1)))).as("_i"))
    val gram = when(col("_i") >= 0,
      concat_ws(" ", (1 to n).map(k => element_at(col("_toks"), col("_i") + k)): _*))
      .otherwise(concat_ws(" ", col("_toks")))
    posed.select(col(idCol), hashFn(gram).as("gram_hash"))
  }

  /** Band table from a signature frame (see [[minhashSignatures]]):
    * one (id, band, band_key) row per band; `keepSig = true` carries the
    * signature array alongside for in-bucket verification (128 B per
    * (doc, band) shuffle row — the cost of verifying WITHOUT a second
    * shuffle of the signature table against the candidate pairs).
    *
    * `keepKeyPrefix = true` additionally carries `kp`: the row's band
    * keys for every band BEFORE its own (band j ⇒ j keys, mean
    * (bands−1)/2 longs/row) — what the first-band pair generators
    * ([[graft.functions.VerifiedBucketPairs]]) need to emit each
    * cross-band-duplicated pair exactly once, replacing the downstream
    * pair-multiset `distinct()` with a per-pair prefix compare. */
  def bandTableFromSignatures(sigs: DataFrame, idCol: String,
      hashFn: Column => Column = hash60, keepSig: Boolean = false,
      keepKeyPrefix: Boolean = false): DataFrame = {
    val keys = bandKeys(
      (0 until minhashA.size).map(i => element_at(col("sig"), i + 1)), hashFn)
    // the 4 band-key hashes are computed ONCE per doc in this narrow
    // codegen'd projection; the explode below only INDEXES the array.
    // Inlining the key expressions into the explode's generator instead
    // (the first first-band form) re-embedded every key into every
    // struct's kp slice — ~20 md5 subtrees per row in one generator
    // expression, past any common-subexpression elimination — and the
    // sf100 re-measure caught the 2-3× wall regression it caused.
    val keyed = sigs.select(col(idCol), col("sig"), array(keys: _*).as("_bk"))
    val exploded = keyed.select(col(idCol), col("sig"),
      explode(array((0 until bands).map { j =>
        val base = Seq(lit(j).as("band"),
          element_at(col("_bk"), j + 1).as("band_key"))
        struct((if (keepKeyPrefix) base :+ slice(col("_bk"), 1, j).as("kp")
          else base): _*)
      }: _*)).as("b"))
    val base = Seq(col(idCol), col("b.band").as("band"), col("b.band_key").as("band_key"))
    val withSig = if (keepSig) base :+ col("sig") else base
    val all = if (keepKeyPrefix) withSig :+ col("b.kp").as("kp") else withSig
    exploded.select(all: _*)
  }

  /** Estimator calibration for the verified near-dup gate: every
    * verified pair with the EXACT distinct-shingle-set Jaccard
    * (intersection/union, same hashed domain the signatures came from)
    * next to the signature estimate `n_eq/k`. Exact Jaccard is computed
    * ONLY for the bounded verified-pair set — the pair frame joins the
    * per-doc gram frame on the high-cardinality doc key (AQE broadcasts
    * the small pair side) and the intersection is an equi-join on
    * (pair, gram hash); never all-pairs. */
  def pairJaccard(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val k = minhashA.size
    // the distinct() is a deliberate REUSE BARRIER, not a dedup (the
    // first-band generator already emits each pair exactly once): this
    // method consumes the pair frame three times (the output frame +
    // both member-id semi-join sides), and without a pruning-proof
    // exchange between the generator and the consumers, column pruning
    // specializes each consumer's subtree so nothing below is shared —
    // the sort-fallback bucket aggregation re-ran per consumer and
    // TRIPLED this row's sf100 spill when round 12 first dropped the
    // distinct. An aggregate keyed on ALL pair columns cannot be pruned
    // through, so its exchange canonicalizes identically under every
    // consumer and the whole derivation runs once; on the near-dup-
    // rate-sized pair set the barrier itself costs nothing. (A
    // repartition was tried first and measured NOT to restore reuse —
    // pruning passes through it.)
    val pairs = verifiedPairsFromSignatures(
      minhashSignatures(df, idCol, textCol), idCol)
      .distinct()
    // ONLY pair members need exact grams: semi-join the corpus down to
    // the verified-pair doc set BEFORE the per-token explosion. Without
    // this the gram distinct + the two intersection joins each shuffle
    // one row per corpus TOKEN — at the r11 sf100 run that was 11 GB of
    // shuffle spilling 140 GB, for grams of docs no pair references.
    // SHUFFLE_HASH, not broadcast and not unhinted (r15): the pair-doc
    // set scales with the near-dup rate, not the corpus, but it is
    // corpus-derived (the r07 no-broadcast-hint rule) — and at the
    // fourth decade it crosses the 10 MB AQE broadcast threshold, so
    // the unhinted plan degraded to a sort-merge join that SORTED the
    // full-text corpus rows: sort width = the document payload, the
    // pair family's recurring anti-pattern, and the bulk of
    // pair_jaccard's 238 GB sf1000 spill (PERF.md round-15 diagnosis).
    // The hash join streams the corpus and builds only the id set.
    val pairDocs = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol))).distinct()
    val pairMembers = df.join(pairDocs.hint("shuffle_hash"), Seq(idCol), "left_semi")
    // per-doc DISTINCT gram set as ONE sorted array row, computed by
    // the per-row [[graft.functions.GramSet]] kernel: a narrow
    // zero-exchange projection — no gram explosion, no aggregate. The
    // r14 form built the same array with ngramHashRows → collect_set →
    // sort_array, and at sf1000 that aggregate was the family's last
    // full-stream spiller (PERF.md round-15: the object aggregate's
    // 128-group fallback sorts the exploded member-gram stream twice).
    // The intersection joins pairs to two doc-keyed array frames and
    // counts `array_intersect` INSIDE the row — no (doc, gram) exploded
    // join anywhere; per-pair state is two bounded arrays. Hash domain
    // and shingle shape are bit-identical to the exploded form
    // (GramSetSpec differential), so the DuckDB oracle is untouched.
    // The coalesce reproduces the exploded form's null-text behavior
    // (one whole-doc empty-string gram, same as minhashSignatures);
    // like the kernel simhash, duplicate ids stay row-per-row where
    // groupBy merged them — identical on unique-keyed tables.
    val gramArr = pairMembers.select(col(idCol),
      call_function("gram_set",
        coalesce(tokens(col(textCol)), array(lit("")))).as("ghs"))
    val ni = size(array_intersect(col("_ga"), col("_gb"))).cast("long")
    val na = size(col("_ga")).cast("long")
    val nb = size(col("_gb")).cast("long")
    pairs
      .join(gramArr.select(col(idCol).as("doc_a"), col("ghs").as("_ga")), Seq("doc_a"))
      .join(gramArr.select(col(idCol).as("doc_b"), col("ghs").as("_gb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_eq"),
        (col("n_eq").cast("double") / k).as("est_jaccard"),
        ni.as("n_inter"),
        (na + nb - ni).as("n_union"),
        (ni.cast("double") / (na + nb - ni)).as("exact_jaccard"))
  }

  /** Estimated signature agreement between two k-element MinHash signature
    * arrays: the count of equal components. `n_eq / k` is an unbiased
    * estimate of the Jaccard similarity of the underlying shingle sets —
    * the in-bucket verifier that keeps LSH band collisions from deleting
    * genuinely distinct documents. */
  def sigAgreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))

  /** VERIFIED near-dup pairs from a signature frame: LSH band-colliding
    * candidates gated by [[sigAgreement]] ≥ `minEqual`. Long-keyed
    * unguarded calls (the catalog, the dedup index) take the SIG-JOIN
    * form: candidates come from the light first-band generator over
    * (id, kp)-only bucket rows, and verification joins the signature
    * frame back on each member id. `maxBucketSize` is the
    * template-flood guard (see [[minhashCandidatePairs]]); guarded and
    * non-long-key calls keep the bucket-carried one-pass form
    * ([[verifiedPairsOnePass]]). Output: (doc_a, doc_b, n_eq) with
    * doc_a < doc_b, distinct.
    *
    * Input contract: `sigs` rows are (id, complete non-null `sig`) —
    * [[minhashSignatures]] guarantees both. On degenerate inputs the
    * two long-key forms diverge: the one-pass kernel SKIPS bucket
    * members whose signature has null holes, while this form's
    * [[sigAgreement]] treats a null component as non-equal and can
    * still emit the pair if enough other components agree; and
    * duplicate ids with differing sigs multiply the verify joins. The
    * forms are set-equal only under the contract (TextOpsSpec pins the
    * production inputs). */
  def verifiedPairsFromSignatures(sigs: DataFrame, idCol: String,
      hashFn: Column => Column = hash60, minEqual: Int = verifyMinEqual,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val isLong = sigs.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    // long-keyed tables take candidates from the FIRST-BAND generator
    // (one emission per pair, no cross-band distinct — the r12b form)
    // over bucket rows that carry ONLY (id, kp), and verify by joining
    // the signature frame back per member. The previous one-pass form
    // rode the 16-long signature along in every bucket row instead; that
    // put 4 copies of every signature through the (band, band_key)
    // exchange and made the sort-based bucket grouping's external sort
    // linear in SIGNATURE bytes — 8.7 GB of local spill per heavy pair
    // row at sf100 (PERF.md round-15 pair-family table; the sf1000
    // projection of that shape, ~10×, exceeds the measurement box's
    // free disk). The signature frame crosses the network exactly once
    // on its doc-id-keyed member-prune exchange — and because that
    // exchange IS doc-keyed, it satisfies the verify joins' doc_a/doc_b
    // requirements directly, so even when AQE degrades the verify joins
    // from broadcast to shuffled, the signature side needs no further
    // exchange (this closes the r14 degraded-mode caveat the ADVICE
    // flagged: the old barrier hashed on (id, sig), which satisfied
    // neither join). The band path stays kp-only either way — the
    // bucket grouping sorts 12 B/row of kp, never 128 B of signature.
    //
    // The verify sides share ONE barriered, member-pruned (id, sig)
    // frame (the r12b lesson: multi-consumed expensive frames need an
    // aggregate, not a repartition): its exchange + broadcast
    // materialize once and both joins reuse them. The verify joins
    // themselves carry the near-dup-rate-sized pair frame — AQE
    // broadcasts it while small and degrades to doc-keyed shuffled
    // joins when it isn't; either way per-pair state is two bounded
    // arrays, never a bucket-wide sort.
    //
    // The first-band rule needs EVERY bucket of a pair's collision set
    // present: under a `maxBucketSize` guard a pair whose first band was
    // guard-excluded would be lost from its surviving later bands, so
    // guarded calls keep the emit-everywhere + distinct form. Other key
    // types keep the generic HOF expansion + distinct (TextOpsSpec and
    // BucketPairsSpec pin all forms set-equal on long keys).
    if (isLong && maxBucketSize.isEmpty) {
      // candidates straight from `sigs` — census-pruned band rows
      // carrying 12 B of kp, not 128 B of signature. The verify joins
      // read from a SEPARATE barriered copy: distinct(), not
      // groupBy(id).agg(first(sig)) — First over an array type has no
      // fixed-width aggregate buffer, compiles to SortAggregate, and
      // full-sorts the corpus per consumer; a grouping-only aggregate
      // carries no buffer, stays HashAggregateExec, and its exchange +
      // broadcast are materialized once and REUSED by both join sides
      // (exec-plan verified: one BroadcastExchange, the second side a
      // ReusedExchange). Net corpus cost: three scans + kernel passes
      // (census, band probe, sig path), one light band exchange, one
      // doc-keyed sig exchange — extra CPU passes vs the one-pass
      // form's single scan, bought back at scale by removing every
      // corpus-volume external sort (PERF.md round-15 before/after).
      val cand = minhashCandidatePairs(
        bandTableFromSignatures(sigs, idCol, hashFn, keepKeyPrefix = true),
        idCol)
      // candidate-pair REUSE BARRIER (the pairJaccard precedent): the
      // frame is now consumed three times — the verify chain plus the
      // two member-id projections below — and the first-band generator
      // emits each pair exactly once, so distinct() dedups nothing; it
      // only pins one shared derivation of the candidate pipeline.
      val candB = cand.distinct()
      // ONLY pair members need signatures in the verify joins: the r15
      // fourth-decade diagnosis (PERF.md) showed the corpus-wide
      // (id, sig) barrier cost 10.3 GB of distinct-aggregate spill plus
      // 14 GB of verify-join SMJ sorts at sf1000 — for 50 M signatures
      // of which ~2 M belong to any candidate pair. Semi-join the
      // signature frame down to candidate members FIRST (SHUFFLE_HASH:
      // the member-id set is near-dup-rate-sized but over the 10 MB AQE
      // broadcast threshold at the fourth decade, and an unhinted plan
      // degrades to sorting the corpus-wide signature frame), then
      // barrier the near-dup-rate-sized remainder.
      val memberIds = candB.select(col("doc_a").as(idCol))
        .union(candB.select(col("doc_b").as(idCol))).distinct()
      // narrow FIRST: the barrier's distinct must see exactly (id, sig)
      // — distinct over a wider caller frame would multiply verify-join
      // rows per extra-column combination (ADVICE r14)
      val sigsB = sigs.select(col(idCol), col("sig"))
        .join(memberIds.hint("shuffle_hash"), Seq(idCol), "left_semi")
        .distinct()
      candB
        .join(sigsB.select(col(idCol).as("doc_a"), col("sig").as("_sa")), Seq("doc_a"))
        .join(sigsB.select(col(idCol).as("doc_b"), col("sig").as("_sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          sigAgreement(col("_sa"), col("_sb")).as("n_eq"))
        .filter(col("n_eq") >= minEqual)
    } else {
      // singleton buckets pruned here too: the census is even more
      // valuable when the bucket rows carry 128 B signatures
      val buckets = pruneSingletonBuckets(
          bandTableFromSignatures(sigs, idCol, hashFn, keepSig = true))
        .groupBy(col("band"), col("band_key"))
        .agg(sort_array(collect_set(struct(col(idCol).as("i"), col("sig").as("g")))).as("ds"))
        .filter(size(col("ds")) > 1)
        .transform(b => maxBucketSize.fold(b)(m => b.filter(size(col("ds")) <= m)))
      val expanded =
        if (isLong)
          buckets.select(
            call_function("bucket_pairs_verified", col("ds"), lit(minEqual)))
        else verifiedPairsHof(buckets, minEqual)
      expanded.distinct()
    }
  }

  /** The pre-round-14 ONE-PASS long-key form of
    * [[verifiedPairsFromSignatures]]: signatures ride along in the
    * bucket rows (4 copies of every signature through the band
    * exchange) and verification happens inside the
    * `bucket_pairs_verified` generator — no verify join, but the
    * sort-based bucket grouping's external sort is linear in signature
    * bytes (8.7 GB local spill per heavy pair row at sf100, ~10× that
    * at sf1000 — past the measurement box's free disk, which is why the
    * sig-join form replaced it as the default). Kept callable for the
    * differential spec and the PERF.md A/B. Degenerate-input caveat:
    * the kernel skips bucket members with null-holed signatures, so on
    * such inputs this form is NOT set-equal to the sig-join form (see
    * [[verifiedPairsFromSignatures]]'s input contract). */
  private[graft] def verifiedPairsOnePass(sigs: DataFrame, idCol: String,
      hashFn: Column => Column = hash60,
      minEqual: Int = verifyMinEqual): DataFrame =
    bandTableFromSignatures(sigs, idCol, hashFn, keepSig = true,
        keepKeyPrefix = true)
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_set(struct(col(idCol).as("i"),
        col("sig").as("g"), col("kp")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(call_function("bucket_pairs_verified", col("ds"), lit(minEqual)))

  /** The generic HOF form of [[verifiedPairsFromSignatures]]'s in-bucket
    * expansion (also its differential twin on long keys): materialize
    * the i<j pair array per bucket, explode, gate. */
  private[graft] def verifiedPairsHof(buckets: DataFrame, minEqual: Int): DataFrame = {
    val pairs = flatten(transform(
      sequence(lit(0), size(col("ds")) - 2),
      i => transform(
        sequence(i + 1, size(col("ds")) - 1),
        j => {
          val a = try_element_at(col("ds"), i + 1)
          val b = try_element_at(col("ds"), j + 1)
          struct(a.getField("i").as("doc_a"), b.getField("i").as("doc_b"),
            sigAgreement(a.getField("g"), b.getField("g")).as("n_eq"))
        })))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_eq").as("n_eq"))
      .filter(col("n_eq") >= minEqual)
  }

  /** [[verifiedPairsFromSignatures]] straight from a document frame —
    * the pair stage every clustering/dedup path uses (candidates from
    * band buckets, drops only after signature verification). */
  def verifiedCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      useXx: Boolean = false, minEqual: Int = verifyMinEqual): DataFrame =
    verifiedPairsFromSignatures(
      minhashSignatures(df, idCol, textCol, useXx), idCol,
      if (useXx) xxhash64(_) else hash60, minEqual)
      .select(col("doc_a"), col("doc_b"))

  /** Candidate near-dup pairs from a band table, bucket-locally and in ONE
    * pass: group doc ids per (band, band_key), emit the in-bucket pairs
    * (i<j over the sorted id set), distinct across bands. A self-join of
    * the band table would compute the whole MinHash pipeline twice (Spark
    * doesn't reuse the exchange across join sides here); the group-and-pair
    * shape scans once and its state is bounded by bucket size — exactly
    * the LSH contract (buckets stay small; a skewed bucket means the band
    * parameters are wrong, not that the plan should absorb it).
    *
    * `maxBucketSize` is the degenerate-bucket (template-flood) guard: a
    * bucket of b members expands b² pairs in ONE task, so a scraper loop
    * dumping 10^6 near-identical pages would stall the stage. Capped
    * buckets are EXCLUDED from pairing — correct pipeline order makes
    * this safe (exact content-hash dedup runs BEFORE the LSH stage, as
    * [[graft.driver.TrainingPrep]] does, so identical floods never reach
    * it); at 100 TB the excluded buckets would be routed to a dedicated
    * flood handler rather than silently absorbed. Default None = the
    * oracle-pinned catalog semantics. */
  def minhashCandidatePairs(bandTable: DataFrame, idCol: String,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val isLong = bandTable.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    val pruned = pruneSingletonBuckets(bandTable)
    // a band table carrying the `kp` band-key prefix (see
    // [[bandTableFromSignatures]]) takes the generator's first-band
    // form: one emission per pair, no cross-band `distinct()` — same
    // contract and same guard caveat as [[verifiedPairsFromSignatures]]
    if (isLong && maxBucketSize.isEmpty && bandTable.columns.contains("kp")) {
      pruned
        .groupBy(col("band"), col("band_key"))
        .agg(sort_array(collect_set(struct(col(idCol).as("i"), col("kp")))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(call_function("bucket_pairs", col("ds")))
    } else {
      val buckets = pruned
        .groupBy(col("band"), col("band_key"))
        .agg(sort_array(collect_set(col(idCol))).as("ids"))
        .filter(size(col("ids")) > 1)
        .transform(b => maxBucketSize.fold(b)(m => b.filter(size(col("ids")) <= m)))
      // native generator on long keys (see [[verifiedPairsFromSignatures]])
      val expanded =
        if (isLong)
          buckets.select(call_function("bucket_pairs", col("ids")))
        else candidatePairsHof(buckets)
      expanded.distinct()
    }
  }

  /** Drops band rows whose (band, band_key) bucket has a single member —
    * rows that can never emit a pair — BEFORE any bucket-materializing
    * aggregate sees them. This is the round-15 fix for the fourth-decade
    * pair-family spill (PERF.md): LSH buckets are near-all singletons
    * (sf1000: 2.5 M pairs from 200 M band rows), yet every row used to
    * enter the `collect_set` ObjectHashAggregate, whose 128-group
    * sort-based fallback externally sorted the FULL band stream twice —
    * 46 GB of the 70 GB `minhash_pairs_verified` spill.
    *
    * Shape matters more than operator choice here, and the first
    * attempt proved it: a separate fixed-width `count` aggregate +
    * semi-join census REPLACED the 46 GB with 34 GB of its own spill
    * (partial 16.4 + final 17.7 GB, measured at sf1000 — PERF.md), plus
    * a second scan + kernel pass, because ANY full-stream aggregate
    * over ~200 M near-unique keys externally sorts ~the stream under a
    * per-task memory share, and partial aggregation — which reduces
    * nothing when keys are near-unique — pays that sort twice. The
    * floor is ONE grouping pass, so the census is a window count over
    * the bucket key: one exchange (the same partitioning the downstream
    * bucket aggregate needs — it follows exchange-free), ONE sort of
    * the band stream (the only full-stream operation; its width is the
    * bounded ≤3-long kp prefix, never a text/signature payload), a
    * streaming per-bucket count, and the singleton filter inside the
    * same pass. The surviving multi-bucket rows (near-dup-rate-sized)
    * are all the object aggregate ever sees. Row-count ≥ 2 is a
    * NECESSARY condition for distinct-member-count ≥ 2, so the
    * downstream `size(ds) > 1` filters keep semantics bit-identical on
    * any input (BucketPairsSpec / TextOpsSpec differentials pin it). */
  private[graft] def pruneSingletonBuckets(bandTable: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_key"))
    bandTable
      .withColumn("_bn", count(lit(1)).over(w))
      .filter(col("_bn") > 1)
      .drop("_bn")
  }

  /** Generic HOF form of [[minhashCandidatePairs]]'s expansion (and its
    * differential twin on long keys). */
  private[graft] def candidatePairsHof(buckets: DataFrame): DataFrame = {
    val pairs = flatten(transform(
      sequence(lit(0), size(col("ids")) - 2),
      i => transform(
        sequence(i + 1, size(col("ids")) - 1),
        j => struct(try_element_at(col("ids"), i + 1).as("a"),
          try_element_at(col("ids"), j + 1).as("b")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
  }

  /** Per-doc SimHash table, backed by the per-row
    * [[graft.functions.SimhashSig]] kernel — a narrow zero-exchange
    * projection (same spill rationale as [[minhashSignatures]]; the
    * exploded twin below is the differential oracle). The null filter
    * reproduces the exploded form's row semantics: explode drops
    * null-token docs entirely — trim/split are null-propagating, so
    * `text IS NOT NULL` is the same predicate without evaluating the
    * split twice per row (ADVICE r11). */
  def simhashTable(df: DataFrame, idCol: String, textCol: String,
      useXx: Boolean = false, width: Int = 32): DataFrame = {
    val fn = if (useXx) "simhash_sig_xx" else "simhash_sig"
    val sig =
      if (width == 32) call_function(fn, tokens(col(textCol)))
      else call_function(fn, tokens(col(textCol)), lit(width))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), sig.as("simhash"))
  }

  /** The relational twin of [[simhashTable]]: explode tokens → hash once
    * → 32 codegen'd bit-balance sums per doc → recombine bits. Retained
    * as the kernel's differential oracle (TextKernelsSpec); note it also
    * MERGES duplicate ids (groupBy) where the kernel form is row-per-row
    * — identical on the catalog's unique-keyed tables. */
  def simhashTableExploded(df: DataFrame, idCol: String, textCol: String,
      hashFn: Column => Column = hash60, width: Int = 32): DataFrame = {
    val hashed = df
      .select(col(idCol).as("_sh_id"), explode(tokens(col(textCol))).as("w"))
      .select(col("_sh_id"), hashFn(col("w")).as("h"))
    val bitAggs = (0 until width).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j")
    }
    hashed.groupBy(col("_sh_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("_sh_id").as(idCol),
        (0 until width).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
          .as("simhash"))
  }

  /** 32-bit SimHash over tokens: bit j set iff the sum of (±1 per token,
    * by token-hash bit j) is positive. Unrolled over the 32 literal bit
    * positions (Spark's shift functions take literal shift amounts); a
    * production deployment would pre-materialize the token hashes once —
    * documented cost, shape identical. */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, t => hash60(t))
    (0 until 32).map { j =>
      val bitBalance = aggregate(hashes, lit(0L),
        (s, h) => s + shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1)
      when(bitBalance > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Rolling polynomial fingerprint: fold (acc·31 + h(w) mod P) mod P over
    * tokens — an order-sensitive content fingerprint (exact-dup detection
    * robust to container/metadata diffs). Backed by the per-row
    * [[graft.functions.RollingFp]] kernel; the handwritten HOF fold
    * ([[fingerprintHof]]) is CodegenFallback — an interpreter loop with a
    * per-token md5 Column eval — and is retained as the differential twin. */
  def fingerprint(toks: Column): Column = call_function("rolling_fp", toks)

  /** HOF twin of [[fingerprint]] (TextKernelsSpec pins equality). */
  def fingerprintHof(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, w) => pmod(acc * 31 + pmod(hash60(w), lit(P)), lit(P)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: list order. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "y", "las", "una", "por"))

  /** Per-language stopword hit counts. */
  def langScores(toks: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, ws) =>
      lang -> size(filter(toks, w => w.isin(ws.map(lit(_)): _*)))
    }

  /** Arg-max language with first-listed tie-break. */
  def langId(toks: Column): Column = {
    val scores = langScores(toks)
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, score), i), els) =>
      val laterMax = scores.drop(i + 1).map(_._2)
      val isMax = laterMax.foldLeft(score > 0)((c, other) => c && score >= other)
      when(isMax, lit(lang)).otherwise(els)
    }
  }
}
