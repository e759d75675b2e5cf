package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extras

/** x02's corpus-scaled LSH scheme (ADVICE r11): the hash count GROWS
  * with corpus size (16 banded 4×4, then 48 as 8×6, then 128 as 16×8)
  * with the S-curve threshold (1/b)^(1/r) pinned at ~0.71 — so the
  * declared J=0.7 contract keeps ≥ ~61% recall at every scale instead
  * of silently collapsing (the r11 fixed-16 scheme fell to 39% then
  * 0.33%). The driver's correctness scales (sf0.01–sf1, ≤ 64k docs)
  * all run the 4×4 regime, so the steeper schemes can only be pinned
  * here. The banding reference is a brute-force driver-side pairing
  * over the same signature matrix: a pair is a candidate iff SOME
  * band's slice of min-hashes matches exactly, and must be emitted
  * EXACTLY once no matter how many bands collide (the
  * first-equal-band in-join dedup replaces a distinct() shuffle, so
  * double-emission would silently double pairs downstream).
  */
class MinhashBandScalingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhashSchemeFor steps at 100k and 2^24 docs") {
    assert(Extras.minhashSchemeFor(1L) === ((16, 4)))
    assert(Extras.minhashSchemeFor(64000L) === ((16, 4)))
    assert(Extras.minhashSchemeFor(100000L) === ((16, 4)))
    assert(Extras.minhashSchemeFor(100001L) === ((48, 8)))
    assert(Extras.minhashSchemeFor(500000L) === ((48, 8)))
    assert(Extras.minhashSchemeFor(1L << 24) === ((48, 8)))
    assert(Extras.minhashSchemeFor((1L << 24) + 1) === ((128, 16)))
  }

  test("the recall schedule has no cliff: >= 61% at J=0.7 in every " +
      "regime, steps <= 4 points, and moderate-J candidates shrink") {
    def recall(j: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, r), b)
    val regimes = Seq((16, 4), (48, 8), (128, 16)).map { case (nh, b) =>
      (b, nh / b)
    }
    // threshold stays pinned: (1/b)^(1/r) within [0.69, 0.72] everywhere
    regimes.foreach { case (b, r) =>
      val t = math.pow(1.0 / b, 1.0 / r)
      assert(t > 0.69 && t < 0.72, s"threshold drifted at b=$b r=$r: $t")
    }
    val rec07 = regimes.map { case (b, r) => recall(0.7, b, r) }
    assert(rec07.forall(_ >= 0.61),
      s"J=0.7 recall must hold at every scale: $rec07")
    rec07.sliding(2).foreach { case Seq(a, c) =>
      assert(a - c <= 0.04, s"regime step too sharp: $a -> $c")
    }
    // the point of steepening: false-candidate volume at moderate J
    // strictly shrinks as the corpus (and the pair count) grows
    val cand03 = regimes.map { case (b, r) => recall(0.3, b, r) }
    assert(cand03.sliding(2).forall { case Seq(a, c) => c < a / 3 },
      s"J=0.3 candidate rate must collapse with scale: $cand03")
  }

  /** Signature matrix with planted band collisions: doc i copies a
    * contiguous band-aligned slice of doc (i - step)'s row, so every
    * band width sees some colliding and some non-colliding pairs; a
    * few docs are full-row copies (collide in EVERY band — the dedup
    * stress case).
    */
  private def sigMatrix(n: Int, nHashes: Int, width: Int,
      seed: Long): IndexedSeq[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    val P = graft.functions.TextFns.HashMod
    val rows = IndexedSeq.fill(n)(Array.fill(nHashes)(math.abs(rnd.nextLong()) % P))
    val nBands = nHashes / width
    for (i <- 4 until n by 3) {
      val src = rows(i - 4)
      val at = (i % nBands) * width
      System.arraycopy(src, at, rows(i), at, width)
    }
    for (i <- 9 until n by 9) // full-row copies: collide in all bands
      System.arraycopy(rows(i - 9), 0, rows(i), 0, nHashes)
    rows
  }

  private def bruteCandidates(rows: IndexedSeq[Array[Long]], nHashes: Int,
      nBands: Int): Set[(Long, Long)] = {
    val width = nHashes / nBands
    (for {
      i <- rows.indices; j <- rows.indices
      if i < j
      if (0 until nBands).exists { b =>
        (0 until width).forall(k => rows(i)(b * width + k) == rows(j)(b * width + k))
      }
    } yield (i.toLong, j.toLong)).toSet
  }

  private def runBanding(rows: IndexedSeq[Array[Long]], nHashes: Int,
      nBands: Int): Seq[(Long, Long)] = {
    val schema = StructType(StructField("doc_id", LongType) +:
      (0 until nHashes).map(k => StructField(s"mh$k", LongType)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(i.toLong +: r.toSeq)
    }
    val sig = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 4), schema)
    Extras.minhashBandCandidates(sig, nHashes, nBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  for ((nHashes, nBands) <- Seq((16, 4), (48, 8), (128, 16))) {
    test(s"band candidates match brute force and are duplicate-free at " +
        s"scheme ${nHashes}h/${nBands}b") {
      val rows = sigMatrix(60, nHashes, nHashes / nBands, seed = 42L + nBands)
      val got = runBanding(rows, nHashes, nBands)
      val expected = bruteCandidates(rows, nHashes, nBands)
      assert(got.toSet === expected)
      assert(got.size === expected.size,
        "a multi-band collision must be emitted exactly once")
      assert(expected.nonEmpty, "test corpus must plant collisions")
    }
  }
}
