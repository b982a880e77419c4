package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SimHash kernel: the 32-bit sign-of-bit-balance hash of a
  * token array in one generated-code pass — the signature stage of
  * `simhash`/`simhash_neardup` without the exploded twin's per-token
  * shuffle rows and 32-column aggregate map (same spill argument as
  * [[MinhashSig]]; the exploded form is retained as
  * `TextOps.simhashTableExploded` and pinned equal by TextKernelsSpec).
  *
  * Semantics (bit-identical to the exploded plan on non-null docs):
  * every token OCCURRENCE hashes once (portable md5 [[graft.queries.hash60]],
  * or xxhash64 seed 42 for the `_xx` variant); bit j of the result is set
  * iff Σ over tokens of (±1 by token-hash bit j) is strictly positive,
  * j ∈ [0, width). Default width 32 (the catalog's `simhash` row); the
  * Hamming near-dup search (`hamming_neardup`) uses width 60 — every bit
  * the md5-derived hash60 carries — because a 32-bit fingerprint's
  * random-collision Hamming distances are statistically indistinguishable
  * from near-dup distances at corpus scale (measured: PERF.md round-12,
  * 12.7 G emitted pairs at 50 M docs). A null token array yields NULL
  * (the exploded form DROPS null docs at the explode — callers that need
  * row parity filter nulls, as `TextOps.simhashTable` does).
  */
case class SimhashSig(child: Expression, useXx: Boolean, width: Int = 32)
    extends UnaryExpression {

  override def prettyName: String = if (useXx) "simhash_sig_xx" else "simhash_sig"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (width < 1 || width > 60) TypeCheckResult.TypeCheckFailure(
        s"$prettyName width must be in [1, 60] (hash60 carries 60 bits), got $width")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[ArrayData], useXx, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.simhash($a, $useXx, $width);")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

/** Per-row rolling polynomial fingerprint kernel:
  * fold (acc·31 + (hash60(w) mod P)) mod P over the token array — the
  * order-sensitive content fingerprint under `doc_fingerprint` and the
  * TrainingPrep feature stamps. The handwritten form
  * (`aggregate(toks, 0, ...)` — kept as `TextOps.fingerprintHof`) is a
  * CodegenFallback higher-order function: an interpreter loop per row
  * with an md5 Column-expression eval per token. This kernel is the same
  * fold as plain JVM code called once per row from generated code.
  * NULL array → NULL; a NULL ELEMENT nulls the whole fingerprint (the
  * HOF's md5(null)=null poisons the fold) — pinned by TextKernelsSpec.
  */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def prettyName: String = "rolling_fp"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingFp(input.asInstanceOf[ArrayData])

  // not nullSafeCodeGen: the kernel can return null for a NON-null input
  // (null element poisons the fold), so null-ness flows from the boxed result
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("fp")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.functions.TextKernels.rollingFp(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object SimhashSig {
  /** Optional 2nd arg is the bit width, a non-null int literal (the
    * width shapes generated code, so it must be known at plan time). */
  private def widthOf(children: Seq[Expression], name: String): Int =
    children.lift(1).map {
      case org.apache.spark.sql.catalyst.expressions.Literal(w: Int, IntegerType) => w
      case other => throw new IllegalArgumentException(
        s"$name width must be an int literal, got ${other.sql}")
    }.getOrElse(32)

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
    (children: Seq[Expression]) => {
      FunctionArity.check("simhash_sig", Seq(1, 2), children)
      SimhashSig(children.head, useXx = false, widthOf(children, "simhash_sig"))
    })

  val descriptorXx: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_sig_xx"),
    new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig_xx"),
    (children: Seq[Expression]) => {
      FunctionArity.check("simhash_sig_xx", Seq(1, 2), children)
      SimhashSig(children.head, useXx = true, widthOf(children, "simhash_sig_xx"))
    })
}

object RollingFp {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_fp"),
    new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
    (children: Seq[Expression]) => {
      FunctionArity.check("rolling_fp", 1, children)
      RollingFp(children.head)
    })
}

/** Plain-JVM per-row loops behind [[SimhashSig]] and [[RollingFp]] —
  * called once per row from generated code (see [[MinhashKernel]]). */
object TextKernels {
  import graft.operators.TextOps

  private val P: Long = TextOps.P

  private def hashToken(t: UTF8String, useXx: Boolean): Long =
    if (useXx) XXH64.hashUTF8String(t, 42L)
    else MinhashKernel.md5Hash60(t)

  /** width-bit SimHash of one document's tokens; every occurrence votes. */
  def simhash(toks: ArrayData, useXx: Boolean, width: Int): Long = {
    val n = toks.numElements()
    val balance = new Array[Int](width)
    var i = 0
    while (i < n) {
      // explode drops nothing within a doc: null elements hash to null in
      // the exploded form and its SUM skips nulls — skip them here too
      if (!toks.isNullAt(i)) {
        val h = hashToken(toks.getUTF8String(i), useXx)
        var j = 0
        while (j < width) {
          balance(j) += (((h >> j) & 1L).toInt * 2 - 1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < width) {
      if (balance(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Rolling fingerprint; null on a null element (matches the HOF fold,
    * where md5(null) = null poisons the remaining accumulation). Boxed
    * return so generated code can see the null. */
  def rollingFp(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val h = java.lang.Math.floorMod(
        MinhashKernel.md5Hash60(toks.getUTF8String(i)), P)
      acc = java.lang.Math.floorMod(acc * 31 + h, P)
      i += 1
    }
    acc
  }
}
