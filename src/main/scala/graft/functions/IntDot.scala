package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd exact integer dot product — the hot-loop primitive
  * under the int8-quantized similarity family (`quant_knn`,
  * `quant_rerank`, `quant_recall`).
  *
  * `int_dot(a, b) = Σ_i a_i · b_i` as a long, over two integral arrays
  * (`array<tinyint|smallint|int|bigint>`); null on length mismatch or
  * null element, mirroring [[ScaledDot]]. Unlike `scaled_dot` there is
  * no rounding anywhere: every product and the sum are exact 64-bit
  * integer arithmetic, so Spark's partitioned evaluation and DuckDB's
  * sequential `list_sum` are trivially bit-identical. Callers keep the
  * sums in range by construction — int8-quantized components are in
  * [-127, 127], so even 2^31-dimensional vectors stay under 2^62.
  *
  * The point of a dedicated kernel (vs casting to double and reusing
  * `scaled_dot`): quantized vectors are stored as `array<tinyint>` — a
  * quarter of the float32 bytes on disk and over the wire — and this
  * expression consumes that representation directly inside whole-stage
  * codegen (primitive `ArrayData` reads, no cast, no allocation), so the
  * 4× byte saving survives into the scan and the kernel. A `scaled_dot`
  * on casted doubles would also break exactness: 127·127·1e12 exceeds
  * 2^53, where its scaled products stop being exactly representable.
  *
  * Registered as the SQL function `int_dot` via [[graft.GraftExtensions]].
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int_dot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _                                                           => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<integral> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def getLong(xs: ArrayData, t: DataType, i: Int): Long = t match {
    case ByteType    => xs.getByte(i).toLong
    case ShortType   => xs.getShort(i).toLong
    case IntegerType => xs.getInt(i).toLong
    case _           => xs.getLong(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      sum += getLong(xs, lt, i) * getLong(ys, rt, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val getX = CodeGenerator.getValue(a, elemType(left), i)
      val getY = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $sum = 0L;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $sum += ((long) $getX) * ((long) $getY);
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("int_dot"),
    new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
    (children: Seq[Expression]) => {
      FunctionArity.check("int_dot", 2, children)
      IntDot(children.head, children(1))
    })
}
