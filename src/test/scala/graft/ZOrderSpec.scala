package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** The z-order layout must give every output partition a TIGHT
  * bounding box in all interleaved dimensions — the property file/
  * row-group pruning feeds on — where a single-column sort leaves one
  * dimension spanning the full range.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Worst (max over partitions) normalized span of one dimension —
    * 1.0 means some partition covers that dimension's whole range, so
    * a filter on it alone can never skip that partition.
    */
  private def worstSpan(df: DataFrame, dim: String, parts: Int): Double = {
    val spans = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max(col(dim)) - min(col(dim))).as("s"))
      .collect()
    // repartitionByRange samples boundaries: a partition MAY end up
    // empty with duplicate keys — that doesn't break the property
    assert(spans.nonEmpty && spans.length <= parts)
    spans.map(_.getLong(1) / 992.0).max
  }

  test("interleave: known bit patterns") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
    val keys = df.select(ZOrder.interleave(Seq($"a", $"b"), 3).as("k"))
      .collect().map(_.getLong(0)).toSeq
    // bit b of a -> output bit 2b; bit b of b -> output bit 2b+1
    // a=3 (011), b=5 (101) -> 100111 = 39
    assert(keys == Seq(0L, 1L, 2L, 39L))
  }

  test("z-order layout tightens both dimensions vs a one-column sort") {
    // a 32x32 grid replicated: both dims uniform, no correlation
    val grid = spark.range(4096)
      .select(expr("(id % 1024) DIV 32 * 32").as("x"),
        ($"id" % 32 * 32).as("y"))
    val parts = 16
    val zOrdered = ZOrder.layout(grid, Seq("x", "y"), parts, bits = 10)
    val bySingle = grid.repartitionByRange(parts, $"x")
    // both layouts tile the same total area; z-order's win is BALANCE:
    // no partition spans a whole dimension, so a filter on EITHER
    // column alone skips partitions. Single-column ranging leaves every
    // partition spanning all of y (worst span 1.0).
    val (zy, zx) = (worstSpan(zOrdered, "y", parts), worstSpan(zOrdered, "x", parts))
    assert(worstSpan(bySingle, "y", parts) >= 0.99)
    assert(zy <= 0.55, s"z-order worst y-span $zy")
    assert(zx <= 0.55, s"z-order worst x-span $zx")
    val yPruneZ = zOrdered.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min($"y").as("mn"), max($"y").as("mx"))
      .filter($"mn" <= 100 && $"mx" >= 100).count()
    val yPruneSingle = bySingle.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min($"y").as("mn"), max($"y").as("mx"))
      .filter($"mn" <= 100 && $"mx" >= 100).count()
    assert(yPruneZ < yPruneSingle,
      s"y=100 touches $yPruneZ z-ordered vs $yPruneSingle single-sorted partitions")
  }

  test("degenerate inputs: constant column, nulls") {
    val df = Seq((Some(1L), 5L), (Some(1L), 9L), (None, 7L)).toDF("x", "y")
    val out = ZOrder.layout(df, Seq("x", "y"), 2, bits = 8)
    assert(out.count() == 3) // no rows lost; null lands in cell 0
  }

  test("full-width long ranges (hash ids) don't overflow under ANSI") {
    val df = spark.range(256)
      .select(xxhash64($"id").as("h1"), xxhash64($"id" + 7).as("h2"))
    val out = ZOrder.layout(df, Seq("h1", "h2"), 4, bits = 10)
    assert(out.count() == 256)
    // the layout must actually spread keys (a wrapped range would
    // clamp every cell to 0 and leave one giant partition)
    val nonEmpty = out.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().count()
    assert(nonEmpty >= 3, s"only $nonEmpty non-empty partitions")
  }

  test("empty input and pre-existing _zkey column survive") {
    val empty = spark.range(10).filter(lit(false))
      .select($"id".as("x"), $"id".as("y"))
    assert(ZOrder.layout(empty, Seq("x", "y"), 2).count() == 0)
    val withKey = Seq((1L, 2L, "keep")).toDF("x", "y", "_zkey0")
    val out = ZOrder.layout(withKey, Seq("x", "y"), 1)
    assert(out.columns.contains("_zkey0") && out.head().getString(2) == "keep")
    // withColumn resolves case-insensitively: a _Zkey0 column must not
    // be clobbered either
    val withCased = Seq((1L, 2L, "keep")).toDF("x", "y", "_Zkey0")
    val outCased = ZOrder.layout(withCased, Seq("x", "y"), 1)
    assert(outCased.columns.contains("_Zkey0") &&
      outCased.head().getString(2) == "keep")
  }

  test("a NaN/Inf row does not collapse the dimension") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, Double.NaN, Double.PositiveInfinity)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("x", "y")
    val keys = df.select(ZOrder.mortonKey(df, Seq("x", "y"), 8).as("k"))
      .collect().map(_.getLong(0)).toSet
    // finite x values must still spread over distinct cells (a
    // collapsed dimension would leave only y contributing)
    assert(keys.size >= 5, s"only ${keys.size} distinct morton keys")
  }

  test("high-magnitude narrow ranges keep their resolution (exact long path)") {
    val base = (1L << 62)
    val df = spark.range(64)
      .select(($"id" + base).as("x"), ($"id" * 3 + base).as("y"))
    val cells = df.select(ZOrder.mortonKey(df, Seq("x", "y"), 10).as("k"))
      .collect().map(_.getLong(0)).toSet
    // a double-domain subtraction would round the whole 64-value
    // spread into one ulp at 2^62 and yield a single key
    assert(cells.size == 64, s"${cells.size} distinct keys for 64 distinct rows")
  }
}
