package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row RP-LSH band keys: all `bands` band keys of one embedding,
  * computed inside whole-stage codegen — no (vector × dim) explode, no
  * (vector × dim × plane) contribution join, no (id, plane) aggregate.
  *
  * This is the vector-side sibling of [[MinhashSig]]/[[SimhashSig]],
  * and it exists for the same measured reason: the relational
  * derivation ([[graft.operators.Vectors.rpLshBandsExploded]] —
  * posexplode dims → broadcast sign join → 20 M × planes-group
  * partial aggregate) was the dominant spiller of `rplsh_knn`'s inline
  * build at the r15 fourth decade (sf1000, 20 M × 96-dim: the
  * (id, plane) aggregate holds 320 M in-flight groups per pass and
  * externally sorts ~the contribution stream; doubling `planes` for
  * the geometry experiment doubled the spill to 229 GB — the build,
  * not the probe, was the wall). Every dimension of a vector already
  * sits inside its own row, so the signature is logically per-row;
  * this expression keeps it there — a zero-exchange projection whose
  * state is `planes` longs.
  *
  * Bit-parity with the exploded form (RpLshKernelSpec differential):
  *  - `scaled(dim) = round(x_double * 1e7)` with Spark `round`'s
  *    HALF_UP BigDecimal semantics, then the exact long;
  *  - hyperplane sign depends only on (plane, dim):
  *    `pmod(hash60("rp<plane>:<dim>"), 2) = 0` ⇒ positive — the same
  *    portable 60-bit-md5 the DuckDB twins recompute;
  *  - `bit(plane) = sum(±scaled over non-null dims) > 0`; a plane with
  *    NO non-null dims contributes 0 to its band key (the exploded
  *    form's null bit falls into the `otherwise(0)` branch);
  *  - `band_key(band) = Σ bit·2^(plane mod perBand)`;
  *  - an EMPTY (or null) embedding yields NULL, so the caller's
  *    posexplode emits nothing — the exploded form's "no dims ⇒ the id
  *    never reaches the key table".
  *
  * Registered as SQL function `rplsh_keys(vec, planes, bands)` via
  * [[graft.GraftExtensions]]; `planes`/`bands` must be foldable int
  * literals (the sign table is cached per geometry).
  */
case class RpLshKeys(child: Expression, planes: Int, bands: Int)
    extends UnaryExpression {

  require(planes > 0 && bands > 0 && planes % bands == 0,
    s"rplsh_keys: planes=$planes not divisible by bands=$bands")

  override def prettyName: String = "rplsh_keys"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // an empty embedding maps to NULL even under a non-null child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }

  private val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any =
    RpLshKernel.keys(input.asInstanceOf[ArrayData], planes, bands, isDouble)

  // unlike the sibling kernels, the result can be null on a NON-null
  // input (empty embedding) — the isNull re-check after the call is load-bearing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.RpLshKernel.keys($a, $planes, $bands, $isDouble);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RpLshKeys =
    copy(child = newChild)
}

object RpLshKeys {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"rplsh_keys: $what must be an int literal, got $other")
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rplsh_keys"),
    new ExpressionInfo(classOf[RpLshKeys].getName, "rplsh_keys"),
    (children: Seq[Expression]) => {
      FunctionArity.check("rplsh_keys", 3, children)
      RpLshKeys(children.head,
        intLit(children(1), "planes"), intLit(children(2), "bands"))
    })
}

/** The per-row loop behind [[RpLshKeys]]; plain JVM code called once per
  * row from generated code (the [[MinhashKernel]] pattern). */
object RpLshKernel {

  /** pos-sign table per geometry: signs(plane * dims + dim). Cached per
    * (planes, dims) — one md5 per (plane, dim) cell EVER, the same
    * "evaluate the hash once per (plane, dim), not per contribution"
    * economy the broadcast sign table bought, now at kernel init. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Boolean]]

  private def signs(planes: Int, dims: Int): Array[Boolean] =
    signCache.computeIfAbsent((planes, dims), { key =>
      val (p, d) = key
      val out = new Array[Boolean](p * d)
      var plane = 0
      while (plane < p) {
        var dim = 0
        while (dim < d) {
          val h = MinhashKernel.md5Hash60(UTF8String.fromString(s"rp$plane:$dim"))
          out(plane * d + dim) = java.lang.Math.floorMod(h, 2L) == 0L
          dim += 1
        }
        plane += 1
      }
      out
    })

  /** Spark `round(x * 1e7, 0).cast("long")` on a double, bit-for-bit:
    * BigDecimal HALF_UP (NOT Math.round, which floors x+0.5 and
    * disagrees on negative halves). Non-finite values: Spark's `round`
    * passes NaN/±Inf through, and under this repo's ANSI mode (Spark 4
    * default, no override anywhere) the long cast then raises
    * CAST_OVERFLOW — so the kernel raises the SAME Spark error instead
    * of BigDecimal's bare NumberFormatException (ADVICE r15: one bad
    * embedding must fail like the exploded twin fails, not with an
    * unrelated exception class; RpLshKernelSpec pins both forms
    * throwing SparkArithmeticException on the same rows). */
  private def scaled(x: Double): Long = {
    val y = x * 1e7
    if (!java.lang.Double.isFinite(y)) {
      // raise the twin's EXACT error by running the twin's exact step:
      // an ANSI double→long Cast on the offending value (the error
      // constructors are private[sql]/private[spark]; the Cast is not)
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(y, DoubleType),
        LongType, None,
        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI).eval(null)
      throw new ArithmeticException(s"rplsh_keys: non-finite value $y") // unreachable
    }
    java.math.BigDecimal.valueOf(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  def keys(vec: ArrayData, planes: Int, bands: Int, isDouble: Boolean): ArrayData = {
    val dims = vec.numElements()
    if (dims == 0) return null
    val sg = signs(planes, dims)
    // per-dim scaled values once (shared across planes), nulls marked
    val sx = new Array[Long](dims)
    val nn = new Array[Boolean](dims)
    var d = 0
    while (d < dims) {
      if (!vec.isNullAt(d)) {
        nn(d) = true
        sx(d) = scaled(if (isDouble) vec.getDouble(d) else vec.getFloat(d).toDouble)
      }
      d += 1
    }
    val perBand = planes / bands
    val out = new Array[Long](bands)
    var plane = 0
    while (plane < planes) {
      var sum = 0L
      var any = false
      var i = 0
      val base = plane * dims
      while (i < dims) {
        if (nn(i)) {
          any = true
          sum += (if (sg(base + i)) sx(i) else -sx(i))
        }
        i += 1
      }
      if (any && sum > 0L)
        out(plane / perBand) += (1L << (plane % perBand))
      plane += 1
    }
    new GenericArrayData(out)
  }
}
