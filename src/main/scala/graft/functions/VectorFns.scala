package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector operations over `array<float>` embedding columns.
  *
  * Two families:
  *  - oracle-exact SQL-expression forms (decimal-accumulated dot
  *    products via higher-order functions — stays in codegen, and the
  *    result is bit-identical across engines regardless of sum order);
  *  - a typed [[Aggregator]] centroid for the library API (float-order
  *    dependent by design → checked rows-only).
  *
  * Scale notes (100 TB): probe-vs-all cosine is a broadcast of the probe
  * + a single scan. All-pairs similarity must never be expressed as a
  * cross join — see the LSH bucketing in
  * [[graft.queries.Extras]] (x06/x12) and MinHash banding (x02).
  */
object VectorFns {

  /** SQL fragment: exact decimal-accumulated dot product of two
    * `array<double>` columns. DECIMAL(30,20) keeps ~1-magnitude values
    * exact without precision-loss rescaling on either engine.
    */
  def dotDecExpr(a: String, b: String): String =
    s"CAST(aggregate(zip_with($a, $b, (x, y) -> CAST(x*y AS DECIMAL(30,20)))," +
      s" CAST(0 AS DECIMAL(30,20)), (acc, x) -> CAST(acc+x AS DECIMAL(30,20))) AS DOUBLE)"

  /** Column form of [[dotDecExpr]] — served by the native codegen
    * kernel [[graft.expressions.DecimalDot]] (bit-identical, ~100x
    * faster than the interpreted higher-order-function form; the
    * session must have called `DecimalDot.register`, which
    * [[graft.queries.Extras]] does at every embedding read).
    */
  def dotDec(a: String, b: String): Column =
    graft.expressions.DecimalDot.decimalDot(col(a), col(b))

  /** The declarative higher-order-function form of [[dotDec]] — kept as
    * the reference semantics the codegen kernel is property-tested
    * against (see ExpressionParitySpec).
    */
  def dotDecHof(a: String, b: String): Column = expr(dotDecExpr(a, b))

  /** float[] -> double[] projection for a raw embedding column. */
  def asDoubleArray(c: String): Column =
    expr(s"transform($c, x -> CAST(x AS DOUBLE))")

  /** Fast (non-oracle) double dot product — served by the codegen
    * kernel [[graft.expressions.DoubleDot]] (the interpreted
    * higher-order-function fold it replaces is the reference
    * semantics, kept as [[dotFastHof]] for the parity spec). Requires
    * `DoubleDot.register`, which [[graft.queries.Extras]] does at
    * every embedding read.
    */
  def dotFast(a: String, b: String): Column =
    graft.expressions.DoubleDot.doubleDot(col(a), col(b))

  /** Declarative reference form of [[dotFast]]. */
  def dotFastHof(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x*y), CAST(0 AS DOUBLE), (acc, x) -> acc+x)")

  /** Element-wise mean of float vectors — typed `Aggregator` (the I-
    * surface of SURVEY §2.1: custom UDAF). Buffer is (running sums,
    * count); merge is element-wise — a standard two-phase distributed
    * mean, so only one shuffle of 64-double buffers per group.
    */
  object CentroidAgg extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

    override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
      val buf = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length) { buf(i) += a(i); i += 1 }
      (buf, b._2 + 1)
    }

    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._2 == 0) y
      else if (y._2 == 0) x
      else {
        val buf = x._1
        var i = 0
        while (i < buf.length) { buf(i) += y._1(i); i += 1 }
        (buf, x._2 + y._2)
      }
    }

    override def finish(b: (Array[Double], Long)): Array[Double] =
      if (b._2 == 0) Array.emptyDoubleArray else b._1.map(_ / b._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoders.doubleArray, Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoders.doubleArray
  }

  /** Untyped-DataFrame handle for [[CentroidAgg]]. */
  def centroidUdaf: Column => Column = {
    val u = udaf(CentroidAgg, ExpressionEncoders.floatArray)
    c => u(c)
  }
}

/** Shared primitive-array encoders (Catalyst-native, not kryo). */
private[functions] object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val floatArray: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}
