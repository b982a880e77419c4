package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnGeometry

/** The ANN index-geometry contract ([[AnnGeometry]]): exact-integer
  * formulas, so every boundary is pinnable. The cross-engine half of
  * the contract (the DuckDB `geom`/`masks`/k CTEs deriving the SAME
  * integers from `count(*)`) is exercised by the oracle gate itself —
  * every rplsh/ivf/semdedup row hash-compares Spark-at-derived-geometry
  * against DuckDB-at-derived-geometry. */
class AnnGeometrySpec extends AnyFunSuite {

  test("bandBits: floor, bucket-target boundaries, measured decades") {
    // small corpora keep the 4-bit/16-plane floor geometry
    assert(AnnGeometry.bandBits(0L) == 4)
    assert(AnnGeometry.bandBits(1L) == 4)
    assert(AnnGeometry.bandBits(500L) == 4)          // sf0.01 fixture
    assert(AnnGeometry.bandBits(2000L) == 4)         // sf0.1 fixture
    assert(AnnGeometry.bandBits(8192L) == 4)         // exactly one bucket
    assert(AnnGeometry.bandBits(8193L) == 4)         // 2 buckets, still floored
    // 16 buckets of 8192 = 131072 is the last 4-bit corpus
    assert(AnnGeometry.bandBits(131072L) == 4)
    assert(AnnGeometry.bandBits(131073L) == 5)
    // the measured decades (r15m/sf1000_vec): sf100 ⇒ 8 bits (32 planes),
    // sf1000 ⇒ 12 bits (48 planes — the 35.4 s / 7.9 GB geometry)
    assert(AnnGeometry.bandBits(2_000_000L) == 8)
    assert(AnnGeometry.bandBits(20_000_000L) == 12)
    assert(AnnGeometry.planes(20_000_000L) == 48)
    // exact power-of-two bucket count (FP-log would be fragile here)
    assert(AnnGeometry.bandBits(8192L * 4096) == 12)
    assert(AnnGeometry.bandBits(8192L * 4096 + 1) == 13)
  }

  test("dedupBandBits: self-join width ≥ probe width, coincides at the floor") {
    // at ≤1024 vectors (16 buckets × 64 rows) both widths are the 4-bit
    // floor — the semdedup_ann row then SHARES rplsh_probe's persisted
    // key artifact (same geometry ⇒ same BuildOnce stamp); the
    // verify-scale fixtures (500 vectors) live here, so the r8–r15
    // recall calibrations stay valid
    for (n <- Seq(0L, 500L, 1024L))
      assert(AnnGeometry.dedupBandBits(n) == 4, s"n=$n")
    // above it, the 64-row dedup bucket target dominates: candidate
    // lists stay ~constant per vector instead of growing with corpus
    assert(AnnGeometry.dedupBandBits(2000L) == 5)       // vs bandBits 4
    assert(AnnGeometry.dedupBandBits(200_000L) == 12)   // vs bandBits 5
    assert(AnnGeometry.dedupBandBits(2_000_000L) == 15) // vs bandBits 8
    assert(AnnGeometry.dedupBandBits(20_000_000L) == 19) // vs bandBits 12
    for (n <- Seq(0L, 500L, 131_073L, 20_000_000L))
      assert(AnnGeometry.dedupBandBits(n) >= AnnGeometry.bandBits(n), s"n=$n")
    assert(AnnGeometry.dedupPlanes(20_000_000L) == 76)
  }

  test("ivfK: floor and ceil(sqrt) boundaries") {
    assert(AnnGeometry.ivfK(0L) == 8)
    assert(AnnGeometry.ivfK(64L) == 8)
    assert(AnnGeometry.ivfK(65L) == 9)      // ceil(8.06)
    assert(AnnGeometry.ivfK(81L) == 9)      // exact square
    assert(AnnGeometry.ivfK(500L) == 23)    // sf0.01 fixture
    assert(AnnGeometry.ivfK(2000L) == 45)   // sf0.1 fixture
    assert(AnnGeometry.ivfK(20_000_000L) == 4473)
  }

  test("lloydSamplePeriod: full Lloyd below 64·k, ~64·k training points above") {
    // every verify/bench fixture trains on the FULL corpus (period 1)
    assert(AnnGeometry.lloydSamplePeriod(500L, AnnGeometry.ivfK(500L)) == 1L)
    assert(AnnGeometry.lloydSamplePeriod(2000L, AnnGeometry.ivfK(2000L)) == 1L)
    // boundary: period leaves 1 exactly when n > 2 * 64k
    val k10 = AnnGeometry.ivfK(200_000L)          // 448
    assert(AnnGeometry.lloydSamplePeriod(200_000L, k10) == 200_000L / (64L * k10))
    // the measured decades: expected sample stays ~64·k, never corpus-scale
    for (n <- Seq(2_000_000L, 20_000_000L)) {
      val k = AnnGeometry.ivfK(n)
      val p = AnnGeometry.lloydSamplePeriod(n, k)
      val sample = n / p
      assert(sample >= 64L * k && sample <= 130L * k,
        s"n=$n: sample $sample vs 64k=${64L * k}")
    }
  }

  test("ivfCoarseK: ceil(sqrt(k)), cells can cover every fine at the floor") {
    assert(AnnGeometry.ivfCoarseK(8) == 3)
    assert(AnnGeometry.ivfCoarseK(23) == 5)     // the sf0.01 verify regime
    assert(AnnGeometry.ivfCoarseK(1415) == 38)  // sf100
    assert(AnnGeometry.ivfCoarseK(4473) == 67)  // sf1000
    // routed cost n·(coarseK + ~2k/coarseK) stays within ~3·sqrt(k)·n
    for (k <- Seq(8, 23, 448, 1415, 4473)) {
      val ck = AnnGeometry.ivfCoarseK(k)
      assert(ck + 2.0 * k / ck <= 3.2 * math.sqrt(k.toDouble), s"k=$k")
    }
  }

  test("probeMasks: exact bucket plus each single-bit flip") {
    assert(AnnGeometry.probeMasks(4) == Seq(0L, 1L, 2L, 4L, 8L))
    assert(AnnGeometry.probeMasks(12).size == 13)
    assert(AnnGeometry.probeMasks(12).distinct.size == 13)
    assert(AnnGeometry.probeMasks(12).tail.forall(m => java.lang.Long.bitCount(m) == 1))
  }

  test("repOnlyProbes: boundary at 2^20, every verify/bench fixture stays full-fanout") {
    // at and below the threshold the FULL Hamming-1 fan-out — the
    // regime every measured recall number below sf100 was taken in —
    // is kept; the verify fixtures (500/2000 vectors) and the sf10
    // campaign fixture (200k) all live here
    for (n <- Seq(0L, 500L, 2000L, 200_000L, 1L << 20))
      assert(!AnnGeometry.repOnlyProbes(n), s"n=$n")
    // strictly above it, Hamming-1 probes are emitted per bucket rep
    // (the measured decades: sf100 = 2M, sf1000 = 20M both flip)
    for (n <- Seq((1L << 20) + 1, 2_000_000L, 20_000_000L))
      assert(AnnGeometry.repOnlyProbes(n), s"n=$n")
  }

  test("planes is always divisible by bands (rplsh_keys precondition)") {
    for (n <- Seq(0L, 1L, 8192L, 131073L, 1_000_000L, 20_000_000L, 1L << 40))
      assert(AnnGeometry.planes(n) % AnnGeometry.Bands == 0, s"n=$n")
  }
}
