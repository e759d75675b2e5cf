package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Plain IEEE-double dot product of two `array<double>` columns as a
  * native codegen Expression — the FAST (non-oracle) sibling of
  * [[DecimalDot]].
  *
  * Semantically equal to the declarative form
  * {{{
  *   aggregate(zip_with(a, b, (x,y) -> x*y), CAST(0 AS DOUBLE),
  *             (acc,x) -> acc+x)
  * }}}
  * (left-to-right double accumulation, so per-row bit-reproducible;
  * null on length mismatch or null elements — zip_with's null padding
  * poisons the fold; NaN/Inf propagate as values), but it stays inside
  * whole-stage codegen instead of re-walking an interpreted lambda per
  * element, per row.
  *
  * This is the PRE-FILTER kernel of the two-stage exact-similarity
  * shape (x61/x62): double scores select the tiny candidate set, the
  * decimal kernel decides. At 100 TB the pre-filter runs O(n×K) times
  * per sweep — it must cost a multiply-add, not a lambda dispatch.
  * Cite: reference has no engine analog (pause-bound API extractor);
  * this serves the beyond-reference similarity family.
  */
case class DoubleDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DoubleDotOps.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.expressions.DoubleDotOps.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DoubleDot =
    copy(left = l, right = r)
  override def prettyName: String = "double_dot"
}

object DoubleDot {
  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("double_dot")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "double_dot", exprs => DoubleDot(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] to have been called). */
  def doubleDot(a: Column, b: Column): Column = call_function("double_dot", a, b)
}

/** Static kernel (separate object so Scala emits static forwarders the
  * generated Java can call directly).
  */
object DoubleDotOps {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
