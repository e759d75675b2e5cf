package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.DecimalDot
import graft.functions.VectorFns

/** The codegen [[DecimalDot]] kernel must be bit-identical to the
  * declarative zip_with/aggregate decimal form it replaces — that form
  * is what the DuckDB oracle mirrors, so any divergence here is an
  * oracle break at sf0.1.
  */
class ExpressionParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def compare(rows: Seq[(Seq[Double], Seq[Double])]): Unit = {
    DecimalDot.register(spark)
    // keep the reference side genuinely interpreted: the injected
    // DecimalDotRewrite rule would otherwise canonicalize it to the
    // very kernel under test
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.DecimalDotRewrite")
    try {
      val bad = rows.toDF("a", "b")
        .select(col("a"), col("b"),
          DecimalDot.decimalDot(col("a"), col("b")).as("fast"),
          VectorFns.dotDecHof("a", "b").as("ref"))
        .filter(not(col("fast") <=> col("ref")))
        .collect()
      assert(bad.isEmpty, bad.take(3).mkString("; "))
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("DecimalDotRewrite canonicalizes the declarative HOF form to the kernel") {
    // must come from a real scan — a literal LocalRelation constant-folds
    // before the kernel is observable in the optimized plan
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .select(VectorFns.dotDecHof("v", "v").as("d"))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DecimalDot])),
      s"kernel not found in optimized plan:\n$optimized")
    assert(df.head().getDouble(0) > 0.0) // a vector's squared norm
  }

  test("GraftExtensions exposes the kernels to plain SQL") {
    assert(spark.sql("SELECT decimal_dot(array(1.5D, 2D), array(2D, 3D)) d")
      .head().getDouble(0) == 9.0)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) n")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT unicode_unescape('\\\\u0041') s")
      .head().getString(0) == "A")
  }

  test("decimal_dot == declarative decimal aggregate on 500 random vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500) {
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextDouble() * 2 - 1), Seq.fill(n)(rnd.nextDouble() * 2 - 1))
    }
    compare(rows)
  }

  test("decimal_dot edge values match (zeros, sub-scale, large, empty)") {
    compare(Seq(
      (Seq(0.0, -0.0, 1.0), Seq(1.0, 2.0, -1.0)),
      (Seq(1e-21, 1e-21, 1e-21), Seq(1.0, -1.0, 0.5)), // below scale-20 -> rounds
      (Seq(123456.789, -0.001), Seq(9876.5, 1000.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1)),
      (Seq.empty[Double], Seq.empty[Double])))
  }

  test("decimal_dot overflow semantics: DECIMAL(30,20) overflow -> null") {
    DecimalDot.register(spark)
    // kernel alone: |product| >= 1e10 overflows 10 integral digits
    val r = Seq((Seq(1e6, 1.0), Seq(1e6, 1.0))).toDF("a", "b")
      .select(DecimalDot.decimalDot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0))
    // running-sum overflow with in-range products
    val r2 = Seq((Seq.fill(3)(9e9), Seq.fill(3)(1.0))).toDF("a", "b")
      .select(DecimalDot.decimalDot(col("a"), col("b")).as("d")).head()
    assert(r2.isNullAt(0))
    // parity with the declarative form under non-ANSI (its CheckOverflow
    // nulls; under ANSI it throws instead — documented divergence)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try compare(Seq(
      (Seq(1e6, 1.0), Seq(1e6, 1.0)),
      (Seq.fill(3)(9e9), Seq.fill(3)(1.0)),
      (Seq(9.999999e9), Seq(1.0)))) // just below the bound: non-null both
    finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("decimal_dot null semantics: length mismatch poisons the sum") {
    compare(Seq((Seq(1.0, 2.0), Seq(1.0))))
    DecimalDot.register(spark)
    val r = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(DecimalDot.decimalDot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0))
  }

  test("sorted_intersect_count == size(array_intersect) on random sets") {
    graft.expressions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300) {
      def set() = Seq.fill(1 + rnd.nextInt(40))(s"w${rnd.nextInt(60)}").distinct.sorted
      (set(), set())
    } ++ Seq((Seq.empty[String], Seq("a")), (Seq.empty[String], Seq.empty[String]))
    val bad = rows.toDF("a", "b")
      .select(
        graft.expressions.SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("decimal_dot survives the codegen path on a real plan") {
    DecimalDot.register(spark)
    val df = Seq((Seq(0.5, 0.25), Seq(2.0, 4.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
      .select(DecimalDot.decimalDot(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(2.0, 2.0))
  }

  test("int_dot == aggregate(zip_with) on random int vectors") {
    graft.expressions.IntDot.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300) {
      def vec() = Seq.fill(64)(rnd.nextInt(255) - 127)
      (vec(), vec())
    } ++ Seq((Seq.empty[Int], Seq.empty[Int]), (Seq(127), Seq(-127)))
    val bad = rows.toDF("a", "b")
      .select(
        graft.expressions.IntDot.intDot(col("a"), col("b")).as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * y)," +
          " CAST(0 AS BIGINT), (acc, p) -> acc + p)").as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("int_dot rejects non-array<int> inputs at analysis time") {
    graft.expressions.IntDot.register(spark)
    val e = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
        .select(graft.expressions.IntDot.intDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<int>"), e.getMessage)
  }

  test("int_dot nulls on length mismatch and null elements") {
    graft.expressions.IntDot.register(spark)
    val r = Seq((Seq(1, 2), Seq(1))).toDF("a", "b")
      .select(graft.expressions.IntDot.intDot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0))
    val r2 = Seq((Seq(Some(1), None), Seq(Some(1), Some(2)))).toDF("a", "b")
      .select(graft.expressions.IntDot.intDot(col("a"), col("b")).as("d")).head()
    assert(r2.isNullAt(0))
  }

  test("double_dot == aggregate(zip_with) double fold on random vectors") {
    graft.expressions.DoubleDot.register(spark)
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300) {
      val n = 1 + rnd.nextInt(64)
      def vec() = Seq.fill(n)(rnd.nextDouble() * 2 - 1)
      (vec(), vec())
    } ++ Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),
      (Seq(Double.MaxValue, Double.MaxValue), Seq(Double.MaxValue, 1.0)))
    val bad = rows.toDF("a", "b")
      .select(
        graft.expressions.DoubleDot.doubleDot(col("a"), col("b")).as("fast"),
        VectorFns.dotFastHof("a", "b").as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("double_dot nulls on length mismatch and null elements") {
    graft.expressions.DoubleDot.register(spark)
    val r = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(graft.expressions.DoubleDot.doubleDot(col("a"), col("b")).as("d"))
      .head()
    assert(r.isNullAt(0))
    val r2 = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))).toDF("a", "b")
      .select(graft.expressions.DoubleDot.doubleDot(col("a"), col("b")).as("d"))
      .head()
    assert(r2.isNullAt(0))
  }
}
