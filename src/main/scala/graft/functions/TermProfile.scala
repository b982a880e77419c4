package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd per-row term-frequency profile:
  * `term_profile(array<string>) = struct(n: bigint, n_distinct: bigint,
  * top_c: bigint)` — element count, distinct-element count, and the
  * highest per-element multiplicity (the mode's count), in ONE pass over
  * the array with a per-row open hash map.
  *
  * This is the kernel under the Gopher-style repetition filters
  * (`repetition_profile`): distinct-word ratio and top-word/top-bigram
  * shares need per-DOC term frequencies, and the relational form —
  * explode + two-level HashAggregate keyed (doc, token) — shuffles one
  * row PER TOKEN OF THE CORPUS. At the r11 third-decade run that was a
  * 6.5 GB shuffle spilling 91 GB for what is logically a per-row
  * computation: every token of a document already sits inside the
  * document's own row. This expression keeps it there — the profile
  * becomes a narrow projection, embarrassingly parallel, zero exchange —
  * and the per-row state is bounded by the DOCUMENT's vocabulary (a few
  * KB), not by any shuffle partition's worth of corpus.
  *
  * Why not `array_distinct`/`aggregate` HOFs: CodegenFallback (an
  * interpreter loop per element) and no O(n) mode — the same reason
  * [[ScaledDot]] exists next to its HOF twin. Here the whole profile is
  * one generated loop inside whole-stage codegen.
  *
  * Semantics pinned by the `repetition_profile` oracle: a NULL array
  * yields NULL; a null ELEMENT counts as its own term (exactly how a
  * relational `GROUP BY token` buckets nulls); an empty array profiles
  * to (0, 0, 0). Equality is UTF8 byte equality, matching both the
  * exploded `groupBy` and DuckDB's `GROUP BY word`.
  *
  * Registered as the SQL function `term_profile` via
  * [[graft.GraftExtensions]].
  */
case class TermProfile(child: Expression) extends UnaryExpression {

  override def prettyName: String = "term_profile"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    // mutable int-holder values: repeated terms cost ONE map lookup and
    // an in-place bump (no re-put, no boxing) — same trick as codegen
    val m = new java.util.HashMap[AnyRef, Array[Int]]()
    var top = 0L
    var i = 0
    while (i < n) {
      val k: AnyRef = if (xs.isNullAt(i)) null else xs.getUTF8String(i)
      val prev = m.get(k)
      val c =
        if (prev == null) { m.put(k, Array(1)); 1 }
        else { prev(0) += 1; prev(0) }
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, m.size().toLong, top))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      // the map is generated-class state reused across rows (clear(), not
      // reallocate): per-row HashMap allocation was measurable GC churn
      // at a billion tokens; capacity stays bounded by the largest single
      // row's vocabulary seen by the task
      val m = ctx.addMutableState("java.util.HashMap", "termProfileMap",
        v => s"$v = new java.util.HashMap();")
      val k = ctx.freshName("k")
      val prev = ctx.freshName("prev")
      val c = ctx.freshName("c")
      val top = ctx.freshName("top")
      val getX = CodeGenerator.getValue(a, StringType, i)
      // raw types + explicit boxing: Janino compiles no generics and no
      // autoboxing
      s"""
        final int $n = $a.numElements();
        $m.clear();
        long $top = 0L;
        for (int $i = 0; $i < $n; $i++) {
          Object $k = $a.isNullAt($i) ? null : (Object) $getX;
          Object $prev = $m.get($k);
          int $c;
          if ($prev == null) {
            int[] h = new int[1]; h[0] = 1;
            $m.put($k, h); $c = 1;
          } else {
            int[] h = (int[]) $prev; h[0]++; $c = h[0];
          }
          if ($c > $top) $top = $c;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] {
            java.lang.Long.valueOf((long) $n),
            java.lang.Long.valueOf((long) $m.size()),
            java.lang.Long.valueOf($top) });
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TermProfile =
    copy(child = newChild)
}

object TermProfile {
  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("term_profile"),
    new ExpressionInfo(classOf[TermProfile].getName, "term_profile"),
    (children: Seq[Expression]) => {
      FunctionArity.check("term_profile", 1, children)
      TermProfile(children.head)
    })
}
