package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass pair statistics for two equal-length `array<bigint>` bit
  * masks (the banded multi-word mask strategy in
  * [[graft.operators.SetSimilarityJoin]]): packs
  *
  *   - the index of the FIRST band (contiguous word-slice, same
  *     base/remainder split as the band join) on which the two masks
  *     agree exactly (−1 if none),
  *   - |A ∩ B| = Σ bit_count(m1[w] & m2[w]),
  *   - |A ∪ B| = Σ bit_count(m1[w] | m2[w])
  *
  * into one long: `(firstEq+1) << 22 | inter << 11 | uni` (both counts
  * ≤ 1024 < 2^11 by the MaxMaskBits cap; nBands ≤ words ≤ 16).
  *
  * Why a native kernel: the declarative form — two
  * `aggregate(zip_with(...))` higher-order functions plus per-band
  * `slice` equality chains — evaluates INTERPRETED per candidate row;
  * at the sf1 rehearsal's 12M candidates that was ~70 s of the q27
  * tail, vs one static call per row here (the same interpreted-HOF →
  * codegen-kernel step as [[DecimalDot]] and [[SortedIntersectCount]]).
  */
case class MaskPairStats(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    MaskPairStatsOps.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.expressions.MaskPairStatsOps.compute($a, $b, $n)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MaskPairStats = copy(first = f, second = s, third = t)
  override def prettyName: String = "mask_pair_stats"
}

object MaskPairStats {
  /** Idempotent session-registry registration (same pattern as
    * [[SortedIntersectCount.register]]).
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("mask_pair_stats")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "mask_pair_stats",
        exprs => MaskPairStats(exprs(0), exprs(1), exprs(2)), "scala_udf")

  /** Column API (requires [[register]]). nBands must be a literal. */
  def maskPairStats(m1: Column, m2: Column, nBands: Column): Column =
    call_function("mask_pair_stats", m1, m2, nBands)
}

/** Static kernel (separate object so Scala emits static forwarders the
  * generated Java can call directly).
  */
object MaskPairStatsOps {
  def compute(a: ArrayData, b: ArrayData, nBands: Int): Long = {
    val words = a.numElements()
    var inter = 0
    var uni = 0
    var w = 0
    while (w < words) {
      val x = a.getLong(w)
      val y = b.getLong(w)
      inter += java.lang.Long.bitCount(x & y)
      uni += java.lang.Long.bitCount(x | y)
      w += 1
    }
    // first band (contiguous word-slice; first `rem` bands get an
    // extra word — MUST match the Scala-side starts/lens split)
    val base = words / nBands
    val rem = words % nBands
    var firstEq = -1
    var off = 0
    var i = 0
    while (i < nBands && firstEq < 0) {
      val len = base + (if (i < rem) 1 else 0)
      var eq = true
      var k = 0
      while (k < len && eq) {
        if (a.getLong(off + k) != b.getLong(off + k)) eq = false
        k += 1
      }
      if (eq) firstEq = i
      off += len
      i += 1
    }
    ((firstEq + 1).toLong << 22) | (inter.toLong << 11) | uni.toLong
  }
}
