package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extras

/** x62's identical-vector compression (r11, the sf10 rehearsal's
  * watch item): the within-cell pair scan runs on exact-duplicate
  * group representatives, and the driver corpora contain no
  * byte-identical embeddings — so the duplicate behavior can only be
  * pinned here. The reference is a driver-side replay of the DECLARED
  * pairwise rule (vector y is dropped iff some same-cell x with
  * x.vec_id < y.vec_id has cosine(x, y) ≥ 0.3) over a fixture planted
  * with: multi-copy duplicate groups whose copies straddle other
  * groups' ids, a cross-group near-duplicate pair, an isolated
  * group, and a zero-vector group (null cosine — never dropped,
  * never drops).
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 12

  /** axis-e_i direction with a small unique perturbation on a second
    * axis so cosines inside a cluster are high and across clusters ~0.
    */
  private def vec(axis: Int, wobbleAxis: Int, wobble: Double): Seq[Double] = {
    val v = Array.fill(dim)(0.0)
    v(axis) = 1.0
    v(wobbleAxis) = wobble
    v.toSeq
  }

  private lazy val fixture: Seq[(Long, Seq[Double])] = {
    // seeds 1..8 live on axes 0..7 (kmeansAssign takes vec 1..K as
    // seeds, K = clamp(floor(sqrt(n)), 8, 1024) = 8 for this n); the
    // planted structure lives on axes 8..11 so no seed can drop it
    val seeds = (0 until 8).map(a => ((a + 1).toLong, vec(a, (a + 1) % 8, 0.05)))
    // cluster on axis 9: a 3-copy duplicate group (ids 20, 23, 31 —
    // straddling other vectors), a near-duplicate of it (cos >> 0.3,
    // id 21 between the copies), and an almost-orthogonal cell-mate
    // (cos < 0.3 vs everything)
    val dupV = vec(9, 10, 0.2)
    val cluster = Seq(
      (20L, dupV), (23L, dupV), (31L, dupV),
      (21L, vec(9, 10, 0.21)),
      (22L, Seq.tabulate(dim)(i => if (i == 9) 0.12 else if (i == 11) 1.0 else 0.0)))
    // an isolated vector on axis 8 — nothing within threshold
    val isolated = Seq((40L, vec(8, 11, 0.07)))
    // zero vectors: a 3-copy group (ids interleaved) — null cosine,
    // keep = 1 for every copy
    val zeros = Seq(25L, 27L, 41L).map(id => (id, Seq.fill(dim)(0.0)))
    seeds ++ cluster ++ isolated ++ zeros
  }

  private lazy val output: Seq[(Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    fixture.toDF("vec_id", "embedding")
      .withColumn("label", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Extras.x62SemanticDedup(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("verdicts match the declared pairwise rule on a duplicate-heavy fixture") {
    val vecs = fixture.toMap
    val cellOf = output.map(r => r._1 -> r._2).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) None else Some(d / (na * nb))
    }
    val expected = fixture.map { case (y, vy) =>
      val dropped = fixture.exists { case (x, vx) =>
        x < y && cellOf(x) == cellOf(y) &&
          cos(vx, vy).exists(_ >= Extras.SemanticDupCosThreshold)
      }
      y -> (if (dropped) 0L else 1L)
    }.toMap
    assert(output.size === fixture.size)
    output.foreach { case (id, _, keep) =>
      assert(keep === expected(id), s"vec $id keep mismatch")
    }
    // the fixture must actually exercise the compression's case split
    val keepOf = output.map(r => r._1 -> r._3).toMap
    assert(keepOf(20L) === 1L, "first duplicate copy is the kept rep")
    assert(keepOf(23L) === 0L && keepOf(31L) === 0L,
      "later byte-identical copies are dropped")
    assert(keepOf(21L) === 0L,
      "a near-duplicate with a smaller-id cell-mate above threshold drops")
    assert(Seq(25L, 27L, 41L).forall(keepOf(_) === 1L),
      "zero vectors (null cosine) are never dropped, copies included")
    assert(keepOf(40L) === 1L, "isolated vector kept")
  }

  test("the duplicate-free fast path matches the declared pairwise rule " +
      "(compression skipped when it cannot pay)") {
    // same planted structure minus every byte-identical copy: the
    // dup-check gate (count == countDistinct of the vector hash) sends
    // this corpus down the direct pair scan — the path every driver sf
    // dir takes — and the verdicts must still match the declared rule
    val dupFree = fixture.groupBy(_._2).values.map(_.minBy(_._1)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-df").toString
    dupFree.toDF("vec_id", "embedding")
      .withColumn("label", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Extras.x62SemanticDedup(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val cellOf = out.map(r => r._1 -> r._2).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) None else Some(d / (na * nb))
    }
    val expected = dupFree.map { case (y, vy) =>
      val dropped = dupFree.exists { case (x, vx) =>
        x < y && cellOf(x) == cellOf(y) &&
          cos(vx, vy).exists(_ >= Extras.SemanticDupCosThreshold)
      }
      y -> (if (dropped) 0L else 1L)
    }.toMap
    assert(out.size === dupFree.size)
    out.foreach { case (id, _, keep) =>
      assert(keep === expected(id), s"vec $id keep mismatch (fast path)")
    }
    // the fixture still exercises both verdicts and the zero-norm rule
    val keepOf = out.map(r => r._1 -> r._3).toMap
    assert(keepOf(21L) === 0L, "near-duplicate drops on the fast path")
    assert(keepOf(25L) === 1L, "zero vector kept on the fast path")
    assert(keepOf(40L) === 1L, "isolated vector kept on the fast path")
  }

  test("identical copies always share a cell (compression's grouping premise)") {
    val byVec = fixture.groupBy(_._2).values.filter(_.size > 1)
    val cellOf = output.map(r => r._1 -> r._2).toMap
    assert(byVec.nonEmpty)
    byVec.foreach { g =>
      assert(g.map(m => cellOf(m._1)).toSet.size === 1,
        s"copies ${g.map(_._1)} must land in one cell")
    }
  }
}
