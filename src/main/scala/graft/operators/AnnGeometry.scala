package graft.operators

import org.apache.spark.sql.SparkSession

/** The ANN index-geometry contract: RP-LSH band-key width and IVF
  * centroid count DERIVED from corpus size, shared bit-for-bit by the
  * Spark catalog rows, the persisted index artifacts (the geometry is
  * folded into each BuildOnce stamp), and the DuckDB oracle twins (the
  * [[bandBitsSql]]/[[ivfKSql]] fragments re-derive the same integers
  * from `count(*)`).
  *
  * Why a contract and not a constant (round-15 fourth-decade diagnosis,
  * `r15m/sf1000_vec/`): a FIXED geometry is a scale constant shipped as
  * a default —
  *  - RP-LSH at 16 planes / 4 bands has 4-bit band keys, so each band
  *    hashes the corpus into ≤16 buckets; buckets are corpus/16 and
  *    every probe's candidate union approaches the corpus. Measured at
  *    20 M vectors: 583 s / 175 GB spill, vs 35.4 s / 7.9 GB at 48
  *    planes (12-bit keys) — `r15m/sf1000_vec/rplsh_kernel_geom48`.
  *    Band-key bits must grow with log2(corpus / target-bucket).
  *  - IVF at k=8 has corpus/8-row inverted lists (2.5 M rows at 20 M
  *    vectors, 13–27 GB spill); the SemDeDup/IVF literature and this
  *    repo's own guard messages say k ≈ √n, which keeps both the list
  *    length AND the number of lists at √n — the balance point between
  *    routing cost (k centroid dots per query) and probe cost
  *    (nprobe·n/k candidate dots per query).
  *
  * Both formulas are exact-integer (no float log anywhere) so the JVM
  * and DuckDB can never disagree on an FP edge:
  *  - `bandBits(n) = max(4, bitLength(ceilDiv(n, 8192) - 1))` — the
  *    smallest key width giving expected bucket size ≤ 8192 rows,
  *    floored at the round-8 small-corpus geometry (4 bits × 4 bands =
  *    16 planes) so sub-131k corpora keep their measured recall shape;
  *  - `ivfK(n) = max(8, ceil(sqrt(n)))` — `sqrt` is correctly rounded
  *    in IEEE-754 on both engines and n < 2^53 is exact in a double,
  *    so the one float step is still bit-deterministic.
  *
  * The per-band bucket target 8192 is sized for the probe side: with a
  * ~100-byte key row a bucket is ≲1 MB, and a Hamming-1 multi-probe
  * over `bands` bands touches (1+bits)·bands buckets ≈ a few hundred
  * thousand candidate rows per query at ANY corpus size — the "touch
  * nprobe/k of the corpus, not 1/16th" shape.
  */
object AnnGeometry {

  /** OR-amplification stays at 4 bands at every scale: more bands is
    * another full copy of the key table (index storage, the scarce
    * resource at 100 TB); recall is instead bought per-query via the
    * Hamming-1 multi-probe ([[probeMasks]]). */
  val Bands = 4

  /** Small-corpus floor: 4-bit keys (16 planes) — the geometry every
    * recall number below sf10 was measured at. */
  val MinBandBits = 4

  /** Expected rows per band bucket the key width is sized to. */
  val TargetBucketRows = 8192L

  /** Small-corpus IVF floor (the pre-r16 fixed k). */
  val MinIvfK = 8

  /** Expected rows per band bucket for the all-corpus SELF-JOIN path
    * (semantic dedup): candidate volume there is
    * n · bands · (1+bits) · bucket, so the bucket must be a small
    * CONSTANT for the pair stream to stay ~linear in n — at the
    * query-probe target of 8192 a 20 M-vector dedup would emit ~5×10¹²
    * base-rate pairs on a near-uniform corpus. 64 rows/bucket keeps
    * per-row pair work bounded (≤ 64·bands·(1+bits) candidates per
    * vector) while buckets stay large enough that true near-dups — who
    * agree on ALL bits of some band — still collide. */
  val DedupTargetBucketRows = 64L

  private def widthFor(n: Long, target: Long): Int = {
    require(n >= 0, s"AnnGeometry: negative corpus size $n")
    val buckets = (n + target - 1) / target
    val bits =
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.max(MinBandBits, bits)
  }

  /** Band-key width in bits for the QUERY-PROBE path (knn): sized so a
    * probed bucket is ≲[[TargetBucketRows]] rows. */
  def bandBits(n: Long): Int = widthFor(n, TargetBucketRows)

  /** Band-key width in bits for the SELF-JOIN path (semantic dedup):
    * sized so every vector's candidate list is ~constant. Always ≥
    * [[bandBits]], and equal to it at the shared 4-bit floor (≤1024
    * vectors, 16 buckets × 64 rows) — where the
    * two paths share one persisted key artifact (the geometry-stamped
    * BuildOnce store unifies them automatically). */
  def dedupBandBits(n: Long): Int =
    math.max(bandBits(n), widthFor(n, DedupTargetBucketRows))

  /** Total hyperplanes = bands × bits. */
  def planes(n: Long): Int = Bands * bandBits(n)

  /** Total hyperplanes for the dedup path. */
  def dedupPlanes(n: Long): Int = Bands * dedupBandBits(n)

  /** IVF centroid count for an `n`-vector corpus. */
  def ivfK(n: Long): Int =
    math.max(MinIvfK, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Lloyd-step training sample: one vector in every `period` by
    * deterministic hash, targeting [[LloydSampleFactor]]·k training
    * points (the FAISS-style max-points-per-centroid bound). Why: with
    * k≈√n a FULL-corpus Lloyd pass is n·k = n^1.5 exact cosines —
    * measured at sf100 (k=1415): `ivf_knn` 1045.6 s, one decade from
    * infeasible (`r16m/sf100_subset/`). Means over a 64·k sample cost
    * 64·k² = 64·n at the contract k — linear — and k-means quality
    * depends on points-per-centroid, not corpus fraction. Period 1
    * (sub-64k corpora, incl. every verify fixture) keeps the exact
    * full-corpus Lloyd this repo measured through round 15. */
  val LloydSampleFactor = 64L

  def lloydSamplePeriod(n: Long, k: Int): Long =
    math.max(1L, n / (LloydSampleFactor * k))

  /** Coarse-routing cell count for the corpus→centroid assignment:
    * √k coarse cells (the first √k centroids), each holding the fine
    * centroids whose top-2 coarse match. Assignment = nearest coarse
    * (n·√k dots) then exact argmax over that cell's ~2·√k fines — the
    * two-level/IMI shape, n·3√k total instead of n·k (= n^1.5 at the
    * contract k). Deterministic and oracle-replayable: the rule, not
    * the result, is the contract (IVF assignment is itself a heuristic;
    * cells can never be empty because cos(c_j, c_j)=1 puts every coarse
    * centroid in its own cell). */
  def ivfCoarseK(k: Int): Int =
    math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Multi-probe masks for a `bits`-wide band key: the exact bucket
    * plus each single-bit flip (Hamming distance 1). Query-side only. */
  def probeMasks(bits: Int): Seq[Long] = 0L +: (0 until bits).map(1L << _)

  /** Corpus size above which the dedup SELF-JOIN's Hamming-1 probes are
    * emitted per bucket REPRESENTATIVE instead of per member (round-17,
    * the round-16 VERDICT's one named structural lever): the full
    * fan-out materializes bands·(1+bits)·n probe rows — ~80n at the
    * fourth decade's 19-bit dedup width, measured at ~5 GB scratch per
    * million vectors (1.6 G rows / ~50 GB exchanged at 20 M,
    * `r16m/sf300_semdedup_ann/` + PERF.md round-16 §9). Representative
    * probing cuts that by ~bucket-size (the [[DedupTargetBucketRows]]
    * design point, ~64×): every member still sends its mask-0 probe (the
    * in-bucket exhaustive pairing is untouched), but cross-bucket
    * Hamming-1 discovery flows through each bucket's min-id rep — the
    * same compare-to-the-representative semantics the star regime
    * already applies INSIDE irreducible buckets, with the same
    * certified-subset contract (a rep probe can miss a drop, never
    * invent one; VectorsSpec pins subset + a measured recall floor in
    * this regime). Below the threshold the full fan-out — whose recall
    * every verify-scale number was measured at — costs ≤ ~5 GB scratch
    * total and keeps it. 2^20 is exact-integer on both engines
    * ([[repOnlySql]] replays the comparison from `count(*)`). */
  val RepProbeThresholdRows: Long = 1L << 20

  /** Rep-only Hamming-1 probe regime for an `n`-vector dedup self-join. */
  def repOnlyProbes(n: Long): Boolean = n > RepProbeThresholdRows

  /** SQL boolean twin of [[repOnlyProbes]]. */
  def repOnlySql(table: String): String =
    s"(SELECT count(*) > $RepProbeThresholdRows FROM $table)"

  // corpus row counts, one Spark count() per (JVM, parquet path) — the
  // geometry of a standing corpus is asked for by every ANN row in a
  // catalog run, and the answer cannot change under a fixed fixture
  private val rowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  /** Row count of a parquet table, cached per path. */
  def corpusRows(s: SparkSession, parquetPath: String): Long =
    rowsCache.computeIfAbsent(parquetPath,
      p => java.lang.Long.valueOf(s.read.parquet(p).count())).longValue()

  /** Test seam: forget cached counts (a spec that rewrites a fixture
    * path must not inherit a stale geometry). */
  private[graft] def invalidateCounts(): Unit = rowsCache.clear()

  // ---- DuckDB twins -------------------------------------------------
  // Each fragment derives the SAME integer as the JVM function above
  // from `count(*)` of `table`. bitLength(x) == length(bin(x)) in
  // DuckDB for x >= 1 (bin() emits no leading zeros).

  /** SQL for [[bandBits]] + [[planes]] as a one-row CTE body:
    * `(bits INTEGER, planes INTEGER)`. */
  def geomSqlBody(table: String): String = widthSqlBody(table, TargetBucketRows)

  /** SQL twin of [[dedupBandBits]]/[[dedupPlanes]] (the max of the two
    * widths, like the JVM function). */
  def dedupGeomSqlBody(table: String): String = s"""
      SELECT GREATEST(k.bits, d.bits) AS bits,
             GREATEST(k.planes, d.planes) AS planes
      FROM (${widthSqlBody(table, TargetBucketRows)}) k,
           (${widthSqlBody(table, DedupTargetBucketRows)}) d"""

  private def widthSqlBody(table: String, target: Long): String = s"""
      SELECT bits, $Bands * bits AS planes FROM (
        SELECT GREATEST($MinBandBits,
                 CASE WHEN b <= 1 THEN 0 ELSE length(bin(b - 1)) END) AS bits
        FROM (SELECT (count(*) + ${target - 1}) // $target AS b
              FROM $table))"""

  /** SQL for the [[probeMasks]] list as a CTE body over a geometry CTE
    * named `geomCte`: one `mask BIGINT` row per probe. */
  def masksSqlBody(geomCte: String): String = s"""
      SELECT CAST(0 AS BIGINT) AS mask
      UNION ALL
      SELECT CAST(pow(2, unnest(range(g.bits))) AS BIGINT) FROM $geomCte g"""

  /** SQL scalar for [[ivfK]]. */
  def ivfKSql(table: String): String =
    s"(SELECT GREATEST($MinIvfK, CAST(ceil(sqrt(count(*))) AS INTEGER)) FROM $table)"

  /** SQL scalar for [[lloydSamplePeriod]] (`//` = truncating division =
    * floor on the non-negative operands here, same as the JVM `/`).
    * Composes [[ivfKSql]] as an uncorrelated scalar subquery so the k
    * derivation lives in ONE string (ADVICE r16: the hand-mirrored
    * inline copy had to track every ivfK change in three places). */
  def lloydPeriodSql(table: String): String =
    s"""(SELECT GREATEST(1, count(*) // ($LloydSampleFactor *
        ${ivfKSql(table)})) FROM $table)"""

  /** SQL scalar for [[ivfCoarseK]] (of the contract [[ivfK]]) —
    * composed from [[ivfKSql]], same single-source rule as
    * [[lloydPeriodSql]]. */
  def ivfCoarseKSql(table: String): String =
    s"""(SELECT GREATEST(1, CAST(ceil(sqrt(${ivfKSql(table)}))
        AS INTEGER)))"""
}
