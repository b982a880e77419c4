package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** `arg_max_by(id, ord)` — the id of the row maximizing `ord`, ties
  * broken by the SMALLEST id: bit-identical to
  * `max(struct(ord, -id))` / a `row_number() OVER (ORDER BY ord DESC,
  * id ASC) = 1` window, including Spark's total float ordering (NaN
  * greatest, -0.0 = 0.0 — both comparisons compile to
  * `SQLOrderingUtil`), but HASH-aggregable.
  *
  * Why it exists (round-16 sf100 incident, `r16m/sf100_subset/`): the
  * corpus→centroid argmax was written as `max(struct(cos, -id))` on
  * the theory that any `max` is a partial hash aggregate. It is not: a
  * STRUCT aggregation buffer is not one of the mutable fixed-width
  * types `HashAggregateExec` can hold in its `UnsafeRow` hash map, so
  * planning silently falls back to SortAggregate — which SORTS the
  * full corpus×centroid score stream (n·k rows; 2.8 G rows at sf100
  * under the k≈√n contract) per partition before aggregating, and
  * every per-group step pays an `UnsafeRow.copy`. Measured: 8 GiB heap
  * OOM at sf100 (2 M × 1415), the same stream the struct form was
  * meant to keep flat. This aggregate holds the SAME state as that
  * struct — (best ord, best id) — but as TWO primitive buffer slots, so
  * `HashAggregateExec` keeps one 16-byte entry per group and the only
  * exchange carries one compact row per group.
  *
  * Null contract: null `ord` rows never win (SQL aggregate semantics —
  * they are skipped); an all-null/empty group evaluates to null id.
  */
case class ArgMaxBy(id: Expression, ord: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = id
  override def right: Expression = ord
  override def nullable: Boolean = true
  override def dataType: DataType = id.dataType
  override def prettyName: String = "arg_max_by"

  override def checkInputDataTypes(): TypeCheckResult = {
    val o = TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)
    if (o.isFailure) o else TypeUtils.checkForOrderingExpr(id.dataType, prettyName)
  }

  private lazy val bestOrd = AttributeReference("bestOrd", ord.dataType)()
  private lazy val bestId = AttributeReference("bestId", id.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestOrd, bestId)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, ord.dataType), Literal.create(null, id.dataType))

  /** (ord, id) beats (curOrd, curId) — Spark comparison semantics on
    * both fields, so the pair ordering is exactly the struct ordering
    * `max(struct(ord, -id))` used. */
  private def step(c: Expression, i: Expression,
      curC: Expression, curI: Expression): Seq[Expression] = {
    val wins = Or(IsNull(curC),
      Or(GreaterThan(c, curC), And(EqualTo(c, curC), LessThan(i, curI))))
    val take = And(IsNotNull(c), wins)
    Seq(If(take, c, curC), If(take, i, curI))
  }

  override lazy val updateExpressions: Seq[Expression] =
    step(ord, id, bestOrd, bestId)

  override lazy val mergeExpressions: Seq[Expression] =
    step(bestOrd.right, bestId.right, bestOrd.left, bestId.left)

  override lazy val evaluateExpression: Expression = bestId

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxBy =
    copy(id = newLeft, ord = newRight)
}

object ArgMaxBy {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("arg_max_by"),
    new ExpressionInfo(classOf[ArgMaxBy].getName, "arg_max_by"),
    (children: Seq[Expression]) => {
      FunctionArity.check("arg_max_by", 2, children)
      ArgMaxBy(children.head, children(1))
    })
}
