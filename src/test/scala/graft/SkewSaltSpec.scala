package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewSalt

/** Salting must be a pure physical transformation: bit-identical
  * results to the unsalted plan on a deliberately skewed dataset
  * (99% of rows share one key).
  */
class SkewSaltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = (1 to 2000).map { i =>
    val key = if (i % 100 == 0) s"k${i % 7}" else "hot"
    (i.toLong, key, i * 0.5)
  }.toDF("row_id", "k", "v")

  private lazy val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"),
    ("k3", "C")).toDF("k", "label")

  test("saltedJoin == plain inner join on a 99%-hot-key dataset") {
    val plain = skewed.join(dim, Seq("k"))
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    val salted = SkewSalt.saltedJoin(skewed, dim, "k", salts = 8,
        distinguisher = "row_id")
      .select("row_id", "k", "v", "label")
      .orderBy("row_id").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedSumCount == plain groupBy aggregation") {
    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = toMap(skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq)
    val salted = toMap(SkewSalt.saltedSumCount(skewed, "k", "v", salts = 8,
        distinguisher = "row_id")
      .orderBy("k").collect().toSeq)
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n, s"count for $k")
      // double sums regroup additions — equal up to ulps, not bit-exact
      assert(math.abs(salted(k)._1 - s) <= math.ulp(s) * 8, s"sum for $k")
    }
  }
}
