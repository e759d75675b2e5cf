package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact decimal-accumulated dot product of two `array<double>` columns,
  * as a native codegen Expression.
  *
  * Bit-identical to the declarative form
  * {{{
  *   CAST(aggregate(zip_with(a, b, (x,y) -> CAST(x*y AS DECIMAL(30,20))),
  *        CAST(0 AS DECIMAL(30,20)), (acc,x) -> CAST(acc+x AS DECIMAL(30,20)))
  *     AS DOUBLE)
  * }}}
  * (each product routed double -> shortest-string -> DECIMAL(30,20)
  * HALF_UP, summed exactly, correctly-rounded back to double — the
  * order-independent form both engines agree on; see
  * [[graft.queries.ExtrasOracle]] for the DuckDB twin), but ~100x
  * faster: Spark's higher-order functions (`zip_with`/`aggregate`)
  * don't participate in whole-stage codegen and re-walk an interpreted
  * expression tree per element, per row. This Expression is one static
  * call into a tight loop and stays inside the codegen span.
  *
  * This is the hot inner kernel of every similarity-search / embedding
  * near-dup operator (x05/x06/x12/Q26b): at 100 TB the dot product runs
  * O(candidates × dims) times, so constant-factor wins here dominate
  * whole-query runtime.
  */
case class DecimalDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotOps.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.expressions.DecimalDotOps.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalDot =
    copy(left = l, right = r)
  override def prettyName: String = "decimal_dot"
}

object DecimalDot {
  /** Register in the session's function registry. Idempotent: the
    * functionExists guard keeps per-query re-registration from spamming
    * "replaced a previously registered function" warnings.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("decimal_dot")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "decimal_dot", exprs => DecimalDot(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] to have been called). */
  def decimalDot(a: Column, b: Column): Column = call_function("decimal_dot", a, b)
}

/** Static kernel (separate object so Scala emits static forwarders the
  * generated Java can call directly).
  */
object DecimalDotOps {
  private val Scale = 20

  /** DECIMAL(30,20) holds 10 integral digits: |v| >= 1e10 overflows. */
  private val OverflowBound = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(10))

  /** Null mirrors the (non-ANSI) SQL semantics of the declarative form:
    * length mismatch (zip_with pads with null), null elements, a
    * NaN/Inf product, or any per-product / running-sum DECIMAL(30,20)
    * overflow (CheckOverflow yields null) poison the whole sum. Under
    * ANSI mode the declarative form would instead THROW on overflow;
    * the kernel stays null-on-overflow (try-semantics) — documented
    * divergence, overflow needs |value| >= 1e10.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      // valueOf = shortest-string repr, exactly Spark's double->decimal cast
      val pd = java.math.BigDecimal.valueOf(p).setScale(Scale, java.math.RoundingMode.HALF_UP)
      if (pd.abs.compareTo(OverflowBound) >= 0) return null
      acc = acc.add(pd)
      if (acc.abs.compareTo(OverflowBound) >= 0) return null
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}
