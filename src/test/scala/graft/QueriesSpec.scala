package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Extras, Inventory}
import graft.functions.VectorFns

/** Cross-query invariants on sf0.001 — semantic checks the DuckDB hash
  * compare can't express (approx error bounds, stream≡batch, typed-vs-
  * SQL agreement).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("Q10 approx_count_distinct within 5% of exact") {
    val exact = Inventory.q10(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Inventory.q10Approx(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("Q28 streaming result equals batch Q20") {
    val batch = Inventory.q20(spark, sf).collect().toSeq
    val stream = Inventory.q28(spark, sf).collect().toSeq
    assert(stream == batch)
  }

  test("Q26 centroid (decimal-exact) agrees with typed Aggregator to 1e-9") {
    val sqlC = Inventory.q26(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val aggC = Extras.q26CentroidAgg(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sqlC.keySet == aggC.keySet)
    sqlC.foreach { case (k, v) =>
      assert(math.abs(v - aggC(k)) < 1e-9, s"$k: $v vs ${aggC(k)}")
    }
  }

  test("CentroidAgg reduce/merge algebra") {
    val a = VectorFns.CentroidAgg
    val b1 = a.reduce(a.reduce(a.zero, Array(1f, 2f)), Array(3f, 4f))
    val b2 = a.reduce(a.zero, Array(5f, 6f))
    val m = a.merge(b1, b2)
    assert(m._2 == 3L)
    assert(a.finish(m).toSeq == Seq(3.0, 4.0))
    assert(a.finish(a.zero).isEmpty)
    assert(a.merge(a.zero, b2)._2 == 1L)
  }

  test("Q27 near-dup pairs are symmetric-free and above threshold") {
    val rows = Inventory.q27(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
    }
  }

  test("x02 MinHash-LSH candidates are a superset-verified subset of exact Q27-style pairs") {
    // every LSH-verified pair at >=0.7 must be a genuinely >=0.7 pair
    val lsh = Extras.x02DedupMinhashLsh(spark, sf).collect()
    assert(lsh.forall(_.getDouble(2) >= Extras.MinhashJaccardThreshold))
    // and at 0.9+, LSH banding (r=4,b=4 => P(cand|J=0.9) ~ 96%) should
    // recover a large fraction of the exact pairs
    val exact09 = Inventory.q27(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = exact09.count(lshPairs.contains)
    assert(recalled.toDouble / exact09.size > 0.5,
      s"LSH recalled $recalled of ${exact09.size} exact 0.9-pairs")
  }

  test("entry() returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
