package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Lazy i<j pair cursor shared by the bucket-pair generators: computes
  * the next passing pair on demand so a guard-ceiling bucket (2^16
  * members) STREAMS rows into GenerateExec instead of buffering O(b²)
  * `InternalRow`s on one task's heap. `emit(i, j)` builds the output
  * row for a pair or returns null to gate it out; the cursor skips
  * gated pairs without allocating. */
private[functions] abstract class PairCursor(n: Int) extends Iterator[InternalRow] {
  protected def emit(i: Int, j: Int): InternalRow
  private[this] var i = 0
  private[this] var j = 0
  private[this] var staged: InternalRow = _
  private[this] def advance(): Unit = {
    staged = null
    while (staged == null) {
      j += 1
      if (j >= n) { i += 1; j = i + 1 }
      if (i >= n - 1) return
      staged = emit(i, j)
    }
  }
  advance()
  override def hasNext: Boolean = staged != null
  override def next(): InternalRow = { val r = staged; advance(); r }
}

private[functions] object PairCursor {
  /** True when any position of the two band-key prefixes matches — the
    * pair already collided in an earlier band, so the CURRENT bucket is
    * not its first and must not emit it (first-band dedup: exactly one
    * bucket in the pair's collision set passes this test). */
  def prefixCollides(a: Array[Long], b: Array[Long]): Boolean = {
    val k = math.min(a.length, b.length)
    var t = 0
    while (t < k) { if (a(t) == b(t)) return true; t += 1 }
    false
  }
}

/** Native in-bucket pair expansion for the LSH verification stage:
  * `bucket_pairs_verified(ds, min_equal)` generates one row
  * `(doc_a, doc_b, n_eq)` per i<j pair of a bucket's
  * `array<struct<i: bigint, g: array<bigint>>>` member set, where
  * `n_eq` counts equal signature components, emitting only pairs with
  * `n_eq >= min_equal`.
  *
  * This replaces the handwritten
  * `explode(flatten(transform(sequence, i -> transform(sequence, j ->
  * struct(..., sigAgreement)))))` chain in
  * [[graft.operators.TextOps.verifiedPairsFromSignatures]]. Higher-order
  * functions are CodegenFallback — for a bucket of b members the chain
  * runs ~b²·k interpreted lambda evaluations and materializes the whole
  * pair array (b² structs, each carrying its own allocation) BEFORE the
  * explode; the post-kernel sf100 run still spent its pair-stage time
  * there. As a [[Generator]] the expansion is one JVM loop per bucket
  * whose pairs are produced lazily through [[PairCursor]] — no
  * intermediate array, no interpreter — and the verification gate is
  * applied before a row is ever built, so sub-threshold pairs (the vast
  * majority at scale: band collisions are precision-losing by design)
  * cost two array reads and a compare loop.
  *
  * Semantics pinned by TextOpsSpec/MinhashKernelSpec differentials:
  * iteration follows array order, so feeding it the same
  * `sort_array(collect_set(...))` the HOF chain consumed yields the
  * identical row set; with two-field members the downstream `distinct()`
  * contract is unchanged.
  *
  * FIRST-BAND form (three-field members): when each member additionally
  * carries its band-key PREFIX `kp: array<bigint>` — the member's band
  * keys for every band BEFORE this bucket's band — a pair is emitted
  * only if no prefix position collides (`kp_a(t) != kp_b(t)` for all t).
  * A pair whose keys collide in band set B is expanded in every bucket
  * of B but emitted exactly at min(B), so the generator's global output
  * is already the DISTINCT pair set and the downstream
  * `distinct()` — a full shuffle+sort of the cross-band pair multiset,
  * the last 2×5.6 GB of the round-12 sf100 spill census — is dropped
  * entirely. The prefix test uses the same band keys the buckets were
  * built from, so the emitted set is byte-identical to distinct-of-
  * multiset (hash-collision buckets included). The prefix is short by
  * construction (band t carries t keys; mean (bands−1)/2 longs).
  *
  * NULL or sub-2-element input generates nothing; bucket members that
  * are null, carry a null id, or carry a null/null-holed signature (or
  * a null/null-holed key prefix in the three-field form) are skipped
  * (ArrayData.toLongArray ignores the null bitmap, so reading them
  * would silently produce garbage — the generators are SQL-registered
  * and user-callable). Registered as the SQL generator function
  * `bucket_pairs_verified` via [[graft.GraftExtensions]]; the ids-only
  * twin `bucket_pairs` ([[BucketIdPairs]]) serves the unverified
  * candidate path. */
case class VerifiedBucketPairs(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "bucket_pairs_verified"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("n_eq", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StructType(fields), _)
        if (fields.length == 2 || fields.length == 3) &&
          fields(0).dataType == LongType &&
          fields.drop(1).forall(_.dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          }) =>
      if (!right.foldable || right.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable int min_equal, got ${right.sql}")
      else if (right.eval(null) == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-null min_equal (a NULL literal would " +
            "unbox to 0 and silently disable the verification gate)")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, array<bigint>[, array<bigint>]>>, " +
        s"got ${t.catalogString}")
  }

  @transient private lazy val minEqual: Int =
    right.eval(null).asInstanceOf[Int]

  /** 3 in the first-band form (members carry a band-key prefix). */
  @transient private lazy val memberArity: Int = left.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType].length

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ds = left.eval(input).asInstanceOf[ArrayData]
    if (ds == null || ds.numElements() < 2) return Iterator.empty
    val m = ds.numElements()
    val arity = memberArity
    // unpack once (ids + k-long signatures + optional key prefixes),
    // skipping null members
    val ids = new Array[Long](m)
    val sigs = new Array[Array[Long]](m)
    val kps = if (arity == 3) new Array[Array[Long]](m) else null
    var n = 0
    var i = 0
    while (i < m) {
      if (!ds.isNullAt(i)) {
        val row = ds.getStruct(i, arity)
        if (!row.isNullAt(0) && !row.isNullAt(1) &&
            (arity == 2 || !row.isNullAt(2))) {
          val sa = row.getArray(1)
          var hole = false
          var c = 0
          while (c < sa.numElements() && !hole) { hole = sa.isNullAt(c); c += 1 }
          val ka = if (arity == 3) row.getArray(2) else null
          if (ka != null) {
            var c2 = 0
            while (c2 < ka.numElements() && !hole) { hole = ka.isNullAt(c2); c2 += 1 }
          }
          if (!hole) {
            ids(n) = row.getLong(0)
            sigs(n) = sa.toLongArray()
            if (kps != null) kps(n) = ka.toLongArray()
            n += 1
          }
        }
      }
      i += 1
    }
    if (n < 2) return Iterator.empty
    val gate = minEqual
    new PairCursor(n) {
      protected def emit(i: Int, j: Int): InternalRow = {
        if (kps != null && PairCursor.prefixCollides(kps(i), kps(j))) return null
        val a = sigs(i); val b = sigs(j)
        val k = math.min(a.length, b.length)
        var eq = 0
        var c = 0
        while (c < k) { if (a(c) == b(c)) eq += 1; c += 1 }
        if (eq >= gate) new GenericInternalRow(Array[Any](ids(i), ids(j), eq))
        else null
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VerifiedBucketPairs =
    copy(left = newLeft, right = newRight)
}

/** Ids-only in-bucket pair generator: `bucket_pairs(ids)` emits one
  * `(doc_a, doc_b)` row per i<j pair of an `array<bigint>` bucket member
  * set — the unverified candidate path
  * ([[graft.operators.TextOps.minhashCandidatePairs]]). Same rationale,
  * lazy emission, iteration order, and null-member skip contract as
  * [[VerifiedBucketPairs]] — including its FIRST-BAND form: members
  * given as `array<struct<i: bigint, kp: array<bigint>>>` carry their
  * band-key prefix, a pair is emitted only in the first band where its
  * keys collide, and the cross-band `distinct()` is dropped. */
case class BucketIdPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "bucket_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(LongType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or " +
        s"array<struct<bigint, array<bigint>>>, got ${t.catalogString}")
  }

  @transient private lazy val structInput: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Iterator.empty
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val kps = if (structInput) new Array[Array[Long]](m) else null
    var n = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        if (kps == null) { ids(n) = arr.getLong(i); n += 1 }
        else {
          val row = arr.getStruct(i, 2)
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val ka = row.getArray(1)
            var hole = false
            var c = 0
            while (c < ka.numElements() && !hole) { hole = ka.isNullAt(c); c += 1 }
            if (!hole) {
              ids(n) = row.getLong(0)
              kps(n) = ka.toLongArray()
              n += 1
            }
          }
        }
      }
      i += 1
    }
    if (n < 2) return Iterator.empty
    new PairCursor(n) {
      protected def emit(i: Int, j: Int): InternalRow =
        if (kps != null && PairCursor.prefixCollides(kps(i), kps(j))) null
        else new GenericInternalRow(Array[Any](ids(i), ids(j)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIdPairs =
    copy(child = newChild)
}

/** Hamming-gated in-bucket pair generator for the SimHash near-dup
  * path: `bucket_hamming_pairs(ds, max_hamming)` over a bucket's
  * `array<struct<id: bigint, simhash: bigint>>` emits
  * `(doc_a, doc_b, hamming)` for i<j pairs with
  * `popcount(simhash_a XOR simhash_b) <= max_hamming`. Same rationale,
  * lazy emission, iteration-order and null contracts as
  * [[VerifiedBucketPairs]]. */
case class HammingBucketPairs(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "bucket_hamming_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, LongType, _, _))), _) =>
      if (!right.foldable || right.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable int max_hamming, got ${right.sql}")
      else if (right.eval(null) == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-null max_hamming (a NULL literal " +
            "would unbox to 0 and over-tighten the gate)")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, bigint>>, got ${t.catalogString}")
  }

  @transient private lazy val maxHamming: Int =
    right.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ds = left.eval(input).asInstanceOf[ArrayData]
    if (ds == null || ds.numElements() < 2) return Iterator.empty
    val m = ds.numElements()
    val ids = new Array[Long](m)
    val hashes = new Array[Long](m)
    var n = 0
    var i = 0
    while (i < m) {
      if (!ds.isNullAt(i)) {
        val row = ds.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ids(n) = row.getLong(0)
          hashes(n) = row.getLong(1)
          n += 1
        }
      }
      i += 1
    }
    if (n < 2) return Iterator.empty
    val gate = maxHamming
    new PairCursor(n) {
      protected def emit(i: Int, j: Int): InternalRow = {
        val h = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
        if (h <= gate) new GenericInternalRow(Array[Any](ids(i), ids(j), h))
        else null
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBucketPairs =
    copy(left = newLeft, right = newRight)
}

object VerifiedBucketPairs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bucket_pairs_verified"),
    new ExpressionInfo(classOf[VerifiedBucketPairs].getName, "bucket_pairs_verified"),
    (children: Seq[Expression]) => {
      FunctionArity.check("bucket_pairs_verified", 2, children)
      VerifiedBucketPairs(children.head, children(1))
    })
}

object BucketIdPairs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bucket_pairs"),
    new ExpressionInfo(classOf[BucketIdPairs].getName, "bucket_pairs"),
    (children: Seq[Expression]) => {
      FunctionArity.check("bucket_pairs", 1, children)
      BucketIdPairs(children.head)
    })
}

object HammingBucketPairs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bucket_hamming_pairs"),
    new ExpressionInfo(classOf[HammingBucketPairs].getName, "bucket_hamming_pairs"),
    (children: Seq[Expression]) => {
      FunctionArity.check("bucket_hamming_pairs", 2, children)
      HammingBucketPairs(children.head, children(1))
    })
}
