package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Exact integer dot product of two `array<int>` columns as a native
  * codegen Expression — the scoring kernel for scalar-quantized
  * (int8-style) vector search (x21).
  *
  * Quantized search is the memory-bound regime's answer at 100 TB of
  * embeddings: a 64-dim float corpus shrinks 4-8x when stored as small
  * ints, and candidate scoring becomes pure integer multiply-adds.
  * With |q| <= 127 and <= 2^44 dims the i64 accumulator cannot
  * overflow, so the kernel is exact — no decimal routing needed, and
  * the DuckDB oracle reproduces it with plain integer arithmetic
  * ([[graft.queries.ExtrasOracle]] x21).
  *
  * Same structure as [[DecimalDot]]: one static call into a tight
  * loop, inside the whole-stage-codegen span; the declarative
  * `aggregate(zip_with(...))` form re-walks an interpreted expression
  * tree per element, per row.
  */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Analysis-time type check: int_dot is SQL-exposed, and `getInt` on
    * an `array<bigint>` would read wrong 4-byte slots (silently wrong
    * sums) — reject anything but `array<int>` before execution.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_dot requires two array<int> arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDotOps.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.expressions.IntDotOps.compute($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDot =
    copy(left = l, right = r)
  override def prettyName: String = "int_dot"
}

object IntDot {
  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("int_dot")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "int_dot", exprs => IntDot(exprs(0), exprs(1)), "scala_udf")

  /** Column API (requires [[register]] to have been called). */
  def intDot(a: Column, b: Column): Column = call_function("int_dot", a, b)
}

/** Static kernel (separate object so Scala emits static forwarders the
  * generated Java can call directly).
  */
object IntDotOps {
  /** Null on length mismatch or null elements (mirrors the zip_with
    * form's null propagation); products and the sum are exact i64 —
    * callers quantize to |q| <= 127, far below any overflow bound.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
