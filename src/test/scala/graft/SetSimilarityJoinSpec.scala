package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimilarityJoin

/** The three exact-Jaccard strategies must be interchangeable: same
  * (d1, d2, jaccard) rows regardless of which physical path ran. The
  * banded-mask path additionally carries a pigeonhole proof obligation
  * (a qualifying pair must agree exactly on one of u+1 mask slices) —
  * the equivalence tests here are what make that argument falsifiable.
  */
class SetSimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (doc_id, tok) distinct items from (doc -> token set). */
  private def items(sets: Map[Long, Seq[String]]): DataFrame =
    sets.toSeq.flatMap { case (d, ts) => ts.distinct.map(t => (d, t)) }
      .toDF("doc_id", "tok")

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select("d1", "d2", "jaccard").as[(Long, Long, Double)]
      .collect().toSeq.sortBy(p => (p._1, p._2))

  /** 150-token vocabulary (3 mask words), docs of ≤ 8 tokens: with
    * t = 0.8, u = ⌊0.25·8⌋ = 2 < 3 words, so jaccardSelfJoin picks the
    * banded path.
    */
  private def denseVocabCorpus(): Map[Long, Seq[String]] = {
    val vocab = (0 until 150).map(i => f"tok$i%03d")
    val rnd = new scala.util.Random(7)
    val base = (0L until 120L).map { d =>
      d -> rnd.shuffle(vocab).take(3 + rnd.nextInt(6)).toSeq
    }.toMap
    // planted near-dups: subset-by-one (J = 7/8), superset collisions,
    // identical triples
    base ++ Map(
      200L -> vocab.take(8),
      201L -> vocab.take(7), // J(200,201) = 7/8 = 0.875 ≥ 0.8
      202L -> vocab.take(8), // identical to 200
      203L -> vocab.take(8), // identical to 200
      210L -> vocab.slice(100, 106),
      211L -> (vocab.slice(100, 106) :+ vocab(140)) // J = 6/7 ≈ 0.857
    )
  }

  test("banded-mask path ≡ token-join path on a >64-token vocabulary") {
    val it = items(denseVocabCorpus()).cache()
    val viaSwitch = collectPairs(SetSimilarityJoin.jaccardSelfJoin(it, 0.8))
    val viaTokens = collectPairs(SetSimilarityJoin.tokenJoinPath(it, 0.8))
    assert(viaSwitch === viaTokens)
    // the planted structure is actually found
    val keys = viaSwitch.map(p => (p._1, p._2)).toSet
    assert(keys.contains((200L, 201L)))
    assert(keys.contains((200L, 202L)) && keys.contains((202L, 203L)))
    assert(keys.contains((210L, 211L)))
    assert(viaSwitch.collect { case (200L, 202L, j) => j } === Seq(1.0))
    it.unpersist()
  }

  test("banded path emits each pair exactly once despite multi-band collisions") {
    // near-identical docs agree on SEVERAL bands (including all-zero
    // band slices) — the first-equal-band in-join filter must still
    // emit one row per pair. Pad docs push the corpus vocabulary to
    // 148 (3 words) without raising the max set size.
    val vocab = (0 until 150).map(i => f"t$i%03d")
    val sets = Map(
      1L -> vocab.take(8), 2L -> vocab.take(7), 3L -> vocab.take(8)) ++
      (10L until 80L).map(d => d -> Seq(s"pad${d}a", s"pad${d}b")).toMap
    val out = collectPairs(SetSimilarityJoin.jaccardSelfJoin(items(sets), 0.8))
    assert(out.map(p => (p._1, p._2)) === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("loose threshold (u+1 > words) falls back to the token join, same answer") {
    // t = 0.5 with 8-token sets gives u = 8 ≥ 3 words — banding loses
    // its pigeonhole bound, the switch must not take it
    val it = items(denseVocabCorpus())
    val viaSwitch = collectPairs(SetSimilarityJoin.jaccardSelfJoin(it, 0.5))
    val viaTokens = collectPairs(SetSimilarityJoin.tokenJoinPath(it, 0.5))
    assert(viaSwitch === viaTokens)
    assert(viaSwitch.nonEmpty)
  }

  test("disjoint vocab regions never pair (the sf1 replica shape)") {
    // two "replicas" with disjoint vocabularies, near-dups only within
    val sets = Map(
      1L -> Seq("a1", "a2", "a3", "a4", "a5", "a6", "a7", "a8"),
      2L -> Seq("a1", "a2", "a3", "a4", "a5", "a6", "a7"),
      3L -> Seq("b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8"),
      4L -> Seq("b1", "b2", "b3", "b4", "b5", "b6", "b7")) ++
      // pad vocab over 64 so the banded path is in play
      (10L until 70L).map(d => d -> Seq(s"pad${d}a", s"pad${d}b")).toMap
    val out = collectPairs(SetSimilarityJoin.jaccardSelfJoin(items(sets), 0.8))
    assert(out.map(p => (p._1, p._2)) === Seq((1L, 2L), (3L, 4L)))
  }

  test("token-join path ≡ driver-side all-pairs brute force (it anchors the others)") {
    // tokenJoinPath is the reference side of the equivalence tests, so
    // it gets its own independent anchor: exact all-pairs Jaccard
    // computed on collected sets, duplicate groups included
    val vocab = (0 until 90).map(i => s"a$i")
    val rnd = new scala.util.Random(41)
    val sets: Map[Long, Seq[String]] = (0L until 60L).map { d =>
      d -> rnd.shuffle(vocab).take(4 + rnd.nextInt(8)).toSeq
    }.toMap ++ Map(
      400L -> vocab.take(6), 401L -> vocab.take(6), 402L -> vocab.take(6),
      403L -> vocab.take(5))
    val got = collectPairs(SetSimilarityJoin.tokenJoinPath(items(sets), 0.6))
    val ss = sets.view.mapValues(_.toSet).toMap
    val expected = (for {
      d1 <- ss.keys; d2 <- ss.keys; if d1 < d2
      j = (ss(d1) & ss(d2)).size.toDouble / (ss(d1) | ss(d2)).size
      if j >= 0.6 && (ss(d1) & ss(d2)).nonEmpty
    } yield (d1, d2, j)).toSeq.sortBy(p => (p._1, p._2))
    assert(got === expected)
    val keys = got.map(p => (p._1, p._2)).toSet
    assert(keys((400L, 401L)) && keys((401L, 402L)) && keys((400L, 403L)))
  }

  test("prefix path ≡ token-join path, including exact-duplicate groups") {
    // duplicate groups are the case the distinct-set compression exists
    // for (the sf5 rehearsal's prefix_len × k²/2 blowup): three docs
    // with the identical set, two near-dups, plus random background
    val vocab = (0 until 150).map(i => f"s$i%03d")
    val rnd = new scala.util.Random(23)
    val sets: Map[Long, Seq[String]] = (0L until 100L).map { d =>
      d -> rnd.shuffle(vocab).take(6 + rnd.nextInt(10)).toSeq
    }.toMap ++ Map(
      300L -> vocab.take(12),
      301L -> vocab.take(12), // identical
      302L -> vocab.take(12), // identical
      303L -> vocab.take(11), // J = 11/12 ≈ 0.917
      310L -> vocab.slice(50, 58),
      311L -> vocab.slice(50, 58).reverse) // same set, different order
    val it = items(sets).cache()
    val viaPrefix = collectPairs(SetSimilarityJoin.prefixJaccardSelfJoin(it, 0.6))
    val viaTokens = collectPairs(SetSimilarityJoin.tokenJoinPath(it, 0.6))
    assert(viaPrefix === viaTokens)
    val keys = viaPrefix.map(p => (p._1, p._2)).toSet
    assert(keys((300L, 301L)) && keys((300L, 302L)) && keys((301L, 302L)))
    assert(keys((300L, 303L)) && keys((310L, 311L)))
    assert(viaPrefix.collect { case (310L, 311L, j) => j } === Seq(1.0))
    it.unpersist()
  }

  test("degenerate corpora: empty, single doc, all-identical — every path") {
    val empty = items(Map.empty)
    assert(SetSimilarityJoin.jaccardSelfJoin(empty, 0.8).count() === 0L)
    assert(SetSimilarityJoin.tokenJoinPath(empty, 0.8).count() === 0L)
    assert(SetSimilarityJoin.prefixJaccardSelfJoin(empty, 0.8).count() === 0L)
    val single = items(Map(1L -> Seq("a", "b", "c")))
    assert(SetSimilarityJoin.jaccardSelfJoin(single, 0.8).count() === 0L)
    assert(SetSimilarityJoin.tokenJoinPath(single, 0.8).count() === 0L)
    assert(SetSimilarityJoin.prefixJaccardSelfJoin(single, 0.8).count() === 0L)
    // an all-identical corpus is ONE group: exactly k*(k-1)/2 pairs at J=1.0
    val allSame = items((1L to 5L).map(d => d -> Seq("x", "y", "z")).toMap)
    for (df <- Seq(SetSimilarityJoin.jaccardSelfJoin(allSame, 0.8),
                   SetSimilarityJoin.tokenJoinPath(allSame, 0.8),
                   SetSimilarityJoin.prefixJaccardSelfJoin(allSame, 0.8))) {
      val ps = collectPairs(df)
      assert(ps.size === 10 && ps.forall(_._3 == 1.0))
    }
  }

  test("small vocabulary still takes the single-word bitset path, same answer") {
    val vocab = (0 until 40).map(i => s"w$i")
    val rnd = new scala.util.Random(11)
    val sets = (0L until 80L).map { d =>
      d -> rnd.shuffle(vocab).take(4 + rnd.nextInt(8)).toSeq
    }.toMap
    val it = items(sets).cache()
    val viaSwitch = collectPairs(SetSimilarityJoin.jaccardSelfJoin(it, 0.7))
    val viaTokens = collectPairs(SetSimilarityJoin.tokenJoinPath(it, 0.7))
    assert(viaSwitch === viaTokens)
    it.unpersist()
  }
}
