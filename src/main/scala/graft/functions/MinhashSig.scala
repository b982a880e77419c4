package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel: all 16 permutation minima of a
  * document's 3-word-shingle hash set, computed per ROW inside
  * whole-stage codegen, with no shingle explosion and no aggregate.
  *
  * This is the signature-build twin of [[TermProfile]]: the relational
  * form ([[graft.operators.TextOps.minhashSignaturesExploded]] — explode
  * shingle start positions → hash → 16 codegen'd `min` partial
  * aggregates per doc) materializes one row per corpus SHINGLE and runs
  * a 16-column hash aggregate keyed by doc id. Map-side combine keeps
  * its shuffle narrow (16 longs per doc), but the aggregation hash map
  * itself holds every in-flight doc's 16-long state per task — at the
  * r11 third-decade run (sf100, ~16 GB corpus) that map was the residual
  * 8.5 GB spill under `minhash_pairs_verified` and the signature-stage
  * share of `pair_jaccard`'s 17 GB. Every shingle of a document already
  * sits inside the document's own row, so the signature is logically a
  * per-row computation; this expression keeps it there — a narrow
  * zero-exchange projection whose state is 16 longs, embarrassingly
  * parallel at any corpus size.
  *
  * Semantics are bit-identical to the exploded form (MinhashKernelSpec
  * pins the differential on fixture docs plus edge rows):
  *   - input is the WHITESPACE TOKEN array ([[graft.operators.TextOps.tokens]]);
  *     tokenization stays in the plan, the kernel owns shingling+hashing;
  *   - `n >= 3` tokens → the n-2 three-word shingles (single-space
  *     joined); fewer → ONE whole-doc shingle (all tokens joined) — the
  *     same shape `TextOps.shingles` emits. Null elements are skipped
  *     exactly as `concat_ws` skips them;
  *   - shingle hash: the portable [[graft.queries.hash60]] (first 60 bits
  *     of md5, matching `conv(substr(md5(x),1,15),16,10)` bit-for-bit, so
  *     DuckDB oracles are unchanged), or native xxhash64 (seed 42 — the
  *     same value `xxhash64(col)` computes) for the production `_xx`
  *     variants; both reduced mod P = 2^31-1;
  *   - signature component i = min over shingles of (a_i·h + b_i) mod P,
  *     with the [[graft.operators.TextOps.minhashA]]/`minhashB`
  *     constants (a·h+b < 2^62: long-exact);
  *   - a NULL token array yields NULL (callers that need the exploded
  *     form's treat-null-as-empty behavior coalesce before the call, as
  *     `TextOps.minhashSignatures` does).
  *
  * Registered as SQL functions `minhash_sig` (md5) and `minhash_sig_xx`
  * (xxhash64) via [[graft.GraftExtensions]].
  */
case class MinhashSig(child: Expression, useXx: Boolean)
    extends UnaryExpression {

  override def prettyName: String = if (useXx) "minhash_sig_xx" else "minhash_sig"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sig(input.asInstanceOf[ArrayData], useXx)

  // one static call per ROW (not per token): the heavy loop lives in
  // MinhashKernel so md5/xxhash stay ordinary JVM code; the call itself
  // sits inside whole-stage codegen (no fallback, no interpreter loop)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashKernel.sig($a, $useXx);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Registration triples for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      FunctionArity.check("minhash_sig", 1, children)
      MinhashSig(children.head, useXx = false)
    })

  val descriptorXx: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig_xx"),
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig_xx"),
    (children: Seq[Expression]) => {
      FunctionArity.check("minhash_sig_xx", 1, children)
      MinhashSig(children.head, useXx = true)
    })
}

/** Per-row sorted DISTINCT 3-shingle hash set — the exact per-doc gram
  * array `pairJaccard` previously built as
  * `ngramHashRows → collect_set → sort_array`: one codegen'd call per
  * row, no shingle explosion, no aggregate, no shuffle. The aggregate
  * form was the last full-stream spiller in the pair family at the
  * fourth decade (PERF.md round-15: ObjectHashAggregate's 128-group
  * fallback sorts the exploded member-gram stream twice — the same
  * near-unique-key partial-aggregation tax the window census removed
  * from the bucket stage). Hash domain, shingle shape (3-word,
  * whole-doc collapse for short docs, null-token skip), sort order,
  * and distinctness are bit-identical to the exploded form
  * (GramSetSpec differential), so the DuckDB oracle is untouched.
  * Registered as `gram_set` (md5) and `gram_set_xx` (xxhash64). */
case class GramSet(child: Expression, useXx: Boolean)
    extends UnaryExpression {

  override def prettyName: String = if (useXx) "gram_set_xx" else "gram_set"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.gramSet(input.asInstanceOf[ArrayData], useXx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashKernel.gramSet($a, $useXx);")

  override protected def withNewChildInternal(newChild: Expression): GramSet =
    copy(child = newChild)
}

object GramSet {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_set"),
    new ExpressionInfo(classOf[GramSet].getName, "gram_set"),
    (children: Seq[Expression]) => {
      FunctionArity.check("gram_set", 1, children)
      GramSet(children.head, useXx = false)
    })

  val descriptorXx: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_set_xx"),
    new ExpressionInfo(classOf[GramSet].getName, "gram_set_xx"),
    (children: Seq[Expression]) => {
      FunctionArity.check("gram_set_xx", 1, children)
      GramSet(children.head, useXx = true)
    })
}

/** The per-row loop behind [[MinhashSig]] — kept as plain JVM code
  * (called once per row from generated code) rather than inlined Janino
  * so the md5 path can use `java.security.MessageDigest` directly. */
object MinhashKernel {
  import graft.operators.TextOps

  private val P: Long = TextOps.P
  private val A: Array[Long] = TextOps.minhashA.toArray
  private val B: Array[Long] = TextOps.minhashB.toArray
  private val K: Int = A.length
  private val Space: UTF8String = UTF8String.fromString(" ")

  // MessageDigest is stateful; one per task thread, digest() self-resets
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 16-long signature array for one document's token array. */
  def sig(toks: ArrayData, useXx: Boolean): ArrayData = {
    val n = toks.numElements()
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (n >= 3) {
      var i = 0
      while (i <= n - 3) {
        fold(mins, hashShingle(toks, i, 3, useXx))
        i += 1
      }
    } else {
      // whole-doc shingle, exactly TextOps.shingles' short-doc collapse
      fold(mins, hashShingle(toks, 0, n, useXx))
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct shingle-hash array for one document's token array
    * (see [[GramSet]]); same shingle walk as [[sig]], collected instead
    * of folded through the permutations. */
  def gramSet(toks: ArrayData, useXx: Boolean): ArrayData = {
    val n = toks.numElements()
    val m = if (n >= 3) n - 2 else 1
    val hs = new Array[Long](m)
    if (n >= 3) {
      var i = 0
      while (i <= n - 3) { hs(i) = hashShingle(toks, i, 3, useXx); i += 1 }
    } else hs(0) = hashShingle(toks, 0, n, useXx)
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** h = hash(join of toks[start, start+len) with single spaces) mod P.
    * Null elements are skipped, matching `concat_ws`. */
  private def hashShingle(toks: ArrayData, start: Int, len: Int,
      useXx: Boolean): Long = {
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      parts(i) = if (toks.isNullAt(start + i)) null
                 else toks.getUTF8String(start + i)
      i += 1
    }
    val s = UTF8String.concatWs(Space, parts: _*)
    val raw =
      if (useXx) XXH64.hashUTF8String(s, 42L) // xxhash64(col)'s fixed seed
      else md5Hash60(s)
    java.lang.Math.floorMod(raw, P)
  }

  /** First 60 bits of md5 — bit-identical to the portable
    * `conv(substr(md5(x),1,15),16,10)` [[graft.queries.hash60]] and
    * DuckDB's `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. Shared by
    * [[TextKernels]] (simhash, rolling fingerprint). */
  def md5Hash60(s: UTF8String): Long = {
    val d = md5Local.get().digest(s.getBytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private def fold(mins: Array[Long], h: Long): Unit = {
    var i = 0
    while (i < K) {
      val v = (A(i) * h + B(i)) % P // a,b,h < 2^31 ⇒ a·h+b < 2^62: exact
      if (v < mins(i)) mins(i) = v
      i += 1
    }
  }
}
