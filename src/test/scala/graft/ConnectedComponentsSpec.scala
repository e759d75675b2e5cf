package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** The large-star/small-star contraction must label every node with
  * its component minimum — including the adversarial deep-chain case
  * that defeats naive min-label propagation round bounds — and the
  * star-edge builder must emit O(n) edges per signature group.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("deep chain collapses to one component rooted at the min") {
    // 1-2-3-...-40: diameter 39, so any fixed-round propagation that
    // assumed "duplicate clusters are shallow" would return wrong
    // labels; star contraction needs only O(log n) rounds
    val chain = (1L until 40L).map(i => (i, i + 1))
    val lab = labelsOf(chain)
    assert((2L to 40L).forall(lab(_) == 1L))
    assert(!lab.contains(1L)) // roots carry no edge; callers coalesce
  }

  test("disjoint components keep separate labels; bridges merge them") {
    val two = labelsOf(Seq((10L, 20L), (20L, 30L), (100L, 200L)))
    assert(two(20L) == 10L && two(30L) == 10L && two(200L) == 100L)
    val merged = labelsOf(Seq((10L, 20L), (20L, 30L), (100L, 200L), (30L, 100L)))
    assert(Seq(20L, 30L, 100L, 200L).forall(merged(_) == 10L))
  }

  test("duplicate / reversed / self edges do not change the result") {
    val lab = labelsOf(Seq((5L, 3L), (3L, 5L), (5L, 3L), (4L, 4L), (3L, 9L)))
    assert(lab(5L) == 3L && lab(9L) == 3L)
    assert(!lab.contains(4L)) // self-edge only => no component membership
  }

  test("starEdges emits k-1 member->min edges per signature group") {
    val df = Seq((1L, "a"), (7L, "a"), (4L, "a"), (9L, "b"), (2L, "c"),
      (3L, "c")).toDF("doc_id", "sig")
    val edges = ConnectedComponents.starEdges(df, "doc_id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((7L, 1L), (4L, 1L), (3L, 2L)))
  }

  test("cross-relation chains land in one cluster (x14 composition)") {
    // relation A groups {1,2} and {3,4}; relation B groups {2,3}:
    // the union must chain all four into cluster 1
    val a = ConnectedComponents.starEdges(
      Seq((1L, "s1"), (2L, "s1"), (3L, "s2"), (4L, "s2")).toDF("doc_id", "sig"),
      "doc_id", "sig")
    val b = ConnectedComponents.starEdges(
      Seq((2L, "t1"), (3L, "t1")).toDF("doc_id", "sig"),
      "doc_id", "sig")
    val lab = ConnectedComponents.run(a.unionByName(b))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L).forall(lab(_) == 1L))
  }
}
