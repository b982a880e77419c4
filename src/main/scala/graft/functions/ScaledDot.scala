package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd scaled-integer dot product — the hot-loop primitive
  * under every similarity query (`knn_*`, `ivf_*`, `embedding_neardup`).
  *
  * `scaled_dot(a, b) = Σ_i round(a_i · b_i · 1e12)` over two float/double
  * arrays, null on length mismatch or null element (mirroring what the
  * equivalent `aggregate(zip_with(...))` chain produces). The determinism
  * contract is unchanged: each product is rounded HALF-AWAY-FROM-ZERO to
  * an integer-valued double — exactly Spark's `round()` (BigDecimal
  * HALF_UP) and DuckDB's `round()` — and a sum of exactly-representable
  * integers (< 2^53) is order-independent, so this stays bit-identical to
  * the DuckDB oracle twins.
  *
  * Why a custom Catalyst Expression (builder-brief preference (b)): the
  * higher-order-function form (`aggregate`/`zip_with`/`transform`) is
  * CodegenFallback in Spark — interpreted per row, with a lambda-variable
  * box per element — which puts an interpreter loop inside the pairwise
  * similarity kernels. This expression is a tight generated `for` loop
  * over the two `ArrayData` (primitive reads, no allocation), keeping the
  * whole similarity stage inside whole-stage codegen; `eval` provides the
  * identical interpreted semantics for non-codegen paths.
  *
  * Registered as the SQL function `scaled_dot` via
  * [[graft.GraftExtensions]] (`SparkSessionExtensions.injectFunction`);
  * `Vectors.dotScaled`/`normScaled` call it through `call_function`.
  */
case class ScaledDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "scaled_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // round half away from zero — bit-identical to Spark round()/BigDecimal
  // HALF_UP and DuckDB round() for |p| < 2^53 (frac = abs - floor(abs) is
  // EXACT in IEEE754 there, so the 0.5 comparison never misrounds the way
  // the classic floor(x + 0.5) trick does)
  private def awayRound(p: Double): Double = {
    val a = math.abs(p)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    if (p < 0) -r else r
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = lt match {
        case FloatType => xs.getFloat(i).toDouble
        case _         => xs.getDouble(i)
      }
      val y = rt match {
        case FloatType => ys.getFloat(i).toDouble
        case _         => ys.getDouble(i)
      }
      sum += awayRound(x * y * 1e12)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      val ab = ctx.freshName("ab")
      val fl = ctx.freshName("fl")
      val r = ctx.freshName("r")
      val bad = ctx.freshName("bad")
      val getX = CodeGenerator.getValue(a, elemType(left), i)
      val getY = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            final double $p = ((double) $getX) * ((double) $getY) * 1.0E12D;
            final double $ab = Math.abs($p);
            final double $fl = Math.floor($ab);
            final double $r = ($ab - $fl >= 0.5D) ? $fl + 1.0D : $fl;
            $sum += ($p < 0.0D) ? -$r : $r;
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledDot =
    copy(left = newLeft, right = newRight)
}

object ScaledDot {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("scaled_dot"),
    new ExpressionInfo(classOf[ScaledDot].getName, "scaled_dot"),
    (children: Seq[Expression]) => {
      FunctionArity.check("scaled_dot", 2, children)
      ScaledDot(children.head, children(1))
    })
}
