package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.expressions.DecimalDot

/** Optimizer rule: recognize the declarative exact-decimal dot-product
  * idiom
  *
  * {{{
  *   CAST(aggregate(zip_with(a, b, (x,y) -> CAST(x*y AS DECIMAL(30,20))),
  *        CAST(0 AS DECIMAL(30,20)), (acc,x) -> CAST(acc+x AS DECIMAL(30,20)))
  *     AS DOUBLE)
  * }}}
  *
  * and canonicalize it to the [[DecimalDot]] codegen kernel — the
  * higher-order-function form evaluates an interpreted expression tree
  * per element; the kernel is one static call per row (~100x). The
  * rewrite is semantics-preserving including null behavior: length
  * mismatch, null elements, and NaN/Inf products all poison the sum to
  * NULL in both forms.
  *
  * Injected by [[graft.GraftExtensions]]; users who write the SQL form
  * (e.g. ports of the DuckDB oracle twins) get the kernel for free.
  */
object DecimalDotRewrite extends Rule[LogicalPlan] {

  private val Dec3020 = DecimalType(30, 20)

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Strip layers that only re-assert DECIMAL(30,20) typing. */
  @annotation.tailrec
  private def strip(e: Expression): Expression = e match {
    case Cast(c, Dec3020, _, _) => strip(c)
    case CheckOverflow(c, Dec3020, _) => strip(c)
    case _ => e
  }

  private def isDecimalZero(e: Expression): Boolean = strip(e) match {
    case Literal(d: Decimal, _: DecimalType) => d.toBigDecimal.signum == 0
    case Literal(0, _) => true
    case _ => false
  }

  /** (x, y) -> CAST(x * y AS DECIMAL(30,20)) over the two zip vars. */
  private def isProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)
        if body.dataType == Dec3020 =>
      strip(body) match {
        case Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
          Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
        case _ => false
      }
    case _ => false
  }

  /** (acc, x) -> CAST(acc + x AS DECIMAL(30,20)) over the two agg vars. */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)
        if body.dataType == Dec3020 =>
      strip(body) match {
        case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
          Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(
            ArrayAggregate(ZipWith(left, right, prod), zero, merge, finish),
            DoubleType, _, _)
          if isDoubleArray(left) && isDoubleArray(right) &&
            isProductLambda(prod) && isDecimalZero(zero) &&
            isSumLambda(merge) && isIdentityLambda(finish) =>
        DecimalDot(left, right)
    }
}
