package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity validation shared by every SQL-registered function builder
  * (ADVICE r16): a wrong-arity call like `arg_max_by(x)` happens during
  * ANALYSIS, so it must surface as an [[AnalysisException]] with the
  * standard `WRONG_NUM_ARGS` error class — the same shape built-in
  * functions raise — not as a bare `IllegalArgumentException` from a
  * `require()` that the SQL layer reports as an internal error. */
private[functions] object FunctionArity {

  /** Throw the standard wrong-arity analysis error unless `children`
    * has one of the accepted sizes. */
  def check(name: String, expected: Seq[Int], children: Seq[Expression]): Unit =
    if (!expected.contains(children.size))
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.mkString(" or "),
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  def check(name: String, expected: Int, children: Seq[Expression]): Unit =
    check(name, Seq(expected), children)
}
