package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extras

/** x02's occupancy-scaled banding (VERDICT r10 #2): the 16 min-hashes
  * band as 4×4 up to 100k docs, 2×8 up to 2^24, then 1×16 — the
  * driver's correctness scales (sf0.01–sf1, ≤ 64k docs) all run the
  * 4×4 regime, so the steeper band shapes can only be pinned here.
  * The reference is a brute-force driver-side pairing over the same
  * signature matrix: a pair is a candidate iff SOME band's slice of
  * min-hashes matches exactly, and must be emitted EXACTLY once no
  * matter how many bands collide (the first-equal-band in-join dedup
  * replaces a distinct() shuffle, so double-emission would silently
  * double pairs downstream).
  */
class MinhashBandScalingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhashBandsFor steps at 100k and 2^24 docs") {
    assert(Extras.minhashBandsFor(1L) === 4)
    assert(Extras.minhashBandsFor(64000L) === 4)
    assert(Extras.minhashBandsFor(100000L) === 4)
    assert(Extras.minhashBandsFor(100001L) === 2)
    assert(Extras.minhashBandsFor(320000L) === 2)
    assert(Extras.minhashBandsFor(1L << 24) === 2)
    assert(Extras.minhashBandsFor((1L << 24) + 1) === 1)
  }

  /** Signature matrix with planted band collisions: doc i copies a
    * contiguous slice of doc (i - step)'s row, so every band width
    * sees some colliding and some non-colliding pairs; a few docs are
    * full-row copies (collide in EVERY band — the dedup stress case).
    */
  private def sigMatrix(n: Int, seed: Long): IndexedSeq[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    val P = graft.functions.TextFns.HashMod
    val rows = IndexedSeq.fill(n)(Array.fill(16)(math.abs(rnd.nextLong()) % P))
    for (i <- 4 until n by 3) {
      val src = rows(i - 4)
      val at = (i % 4) * 4
      // copy one 4-row slice (aligns with a 4-band band; half the
      // time lands inside an 8-row band slice too)
      System.arraycopy(src, at, rows(i), at, 4)
    }
    for (i <- 9 until n by 9) // full-row copies: collide in all bands
      System.arraycopy(rows(i - 9), 0, rows(i), 0, 16)
    rows
  }

  private def bruteCandidates(rows: IndexedSeq[Array[Long]],
      nBands: Int): Set[(Long, Long)] = {
    val width = 16 / nBands
    (for {
      i <- rows.indices; j <- rows.indices
      if i < j
      if (0 until nBands).exists { b =>
        (0 until width).forall(k => rows(i)(b * width + k) == rows(j)(b * width + k))
      }
    } yield (i.toLong, j.toLong)).toSet
  }

  private def runBanding(rows: IndexedSeq[Array[Long]], nBands: Int): Seq[(Long, Long)] = {
    val schema = StructType(StructField("doc_id", LongType) +:
      (0 until 16).map(k => StructField(s"mh$k", LongType)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(i.toLong +: r.toSeq)
    }
    val sig = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 4), schema)
    Extras.minhashBandCandidates(sig, nBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  for (nBands <- Seq(1, 2, 4)) {
    test(s"band candidates match brute force and are duplicate-free at nBands=$nBands") {
      val rows = sigMatrix(60, seed = 42L + nBands)
      val got = runBanding(rows, nBands)
      val expected = bruteCandidates(rows, nBands)
      assert(got.toSet === expected)
      assert(got.size === expected.size,
        "a multi-band collision must be emitted exactly once")
      assert(expected.nonEmpty, "test corpus must plant collisions")
    }
  }

  test("steeper banding only removes candidates (monotone selectivity)") {
    val rows = sigMatrix(60, seed = 7L)
    val c4 = bruteCandidates(rows, 4)
    val c2 = bruteCandidates(rows, 2)
    val c1 = bruteCandidates(rows, 1)
    assert(c2.subsetOf(c4) && c1.subsetOf(c2))
  }
}
