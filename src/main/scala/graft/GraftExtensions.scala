package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DecimalDot, SortedIntersectCount, UnicodeUnescape}

/** Library entry point for `spark.sql.extensions`: injects the graft
  * custom Catalyst expressions into every session's function registry,
  * so SQL users get them natively:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT decimal_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * The query library also registers the same functions imperatively
  * (`DecimalDot.register(spark)` etc.) so it works on stock sessions;
  * this class is the idiomatic wiring for clusters where the session
  * is built by the platform, not the job.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "scala_udf")

    def arity(name: String, n: Int)(children: Seq[Expression]): Seq[Expression] = {
      if (children.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> children.length.toString, "docroot" -> ""))
      children
    }

    ext.injectFunction((
      FunctionIdentifier("decimal_dot"),
      info("decimal_dot",
        "decimal_dot(a, b) - exact DECIMAL(30,20)-accumulated dot product of two array<double>"),
      (children: Seq[Expression]) => {
        val c = arity("decimal_dot", 2)(children); DecimalDot(c(0), c(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A ∩ B| of two sorted unique array<string>"),
      (children: Seq[Expression]) => {
        val c = arity("sorted_intersect_count", 2)(children)
        SortedIntersectCount(c(0), c(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("unicode_unescape"),
      info("unicode_unescape",
        "unicode_unescape(s) - decode \\uXXXX / \\xNN escape sequences"),
      (children: Seq[Expression]) =>
        UnicodeUnescape(arity("unicode_unescape", 1)(children).head)))

    // Canonicalize the declarative decimal-dot idiom to the codegen
    // kernel wherever it appears in a plan.
    ext.injectOptimizerRule(_ => graft.plans.DecimalDotRewrite)
  }
}
