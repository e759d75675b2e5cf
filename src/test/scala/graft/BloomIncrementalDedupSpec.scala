package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomIncrementalDedup

/** The bloom route must never change the ANSWER — only which rows pay
  * the verify join. Every case asserts equality with the plain
  * LEFT ANTI reference, including a sketch sized so small that false
  * positives are certain (the verify join must absorb them).
  */
class BloomIncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newKeys(incoming: Seq[(Long, String)], history: Seq[String],
      expectedItems: Long = 1000L, numBits: Long = 8192L): Set[Long] =
    BloomIncrementalDedup.newRows(
      incoming.toDF("id", "k"), history.toDF("k"), "k",
      expectedItems, numBits)
      .collect().map(_.getLong(0)).toSet

  test("drops exactly the rows whose key exists in history") {
    val inc = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "b"))
    assert(newKeys(inc, Seq("b", "z")) == Set(1L, 3L))
  }

  test("empty history keeps everything (null bloom fast path)") {
    val inc = Seq((1L, "a"), (2L, "b"))
    assert(newKeys(inc, Seq.empty) == Set(1L, 2L))
  }

  test("disjoint keys keep everything") {
    val inc = Seq((1L, "a"), (2L, "b"))
    assert(newKeys(inc, Seq("x", "y", "z")) == Set(1L, 2L))
  }

  test("an undersized sketch (guaranteed false positives) is still exact") {
    // 8 bits for 500 history keys: essentially every probe reports
    // "maybe" — correctness must come entirely from the verify join
    val inc = (1L to 100L).map(i => (i, s"k$i"))
    val hist = (51 to 550).map(i => s"k$i")
    assert(newKeys(inc, hist, expectedItems = 500L, numBits = 8L) ==
      (1L to 50L).toSet)
  }

  test("matches the plain anti join on an overlapping random-ish mix") {
    val inc = (1L to 200L).map(i => (i, s"v${i % 37}"))
    val hist = (0 to 11).map(i => s"v$i")
    val expected = inc.collect { case (id, k) if !hist.contains(k) => id }.toSet
    assert(newKeys(inc, hist) == expected)
  }
}
