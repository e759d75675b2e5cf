package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extras

/** x02's MIDDLE strategy (64 < vocab ≤ 1024: distinct-set compression
  * + multi-word-mask verify) only activates above the 64-token
  * boundary, which the sf0.001–0.1 correctness gates never cross —
  * this spec is its oracle. The reference is a fully driver-side
  * replay of the DECLARED semantics (16 min-hashes → 4 packed bands →
  * candidate iff any band collides → exact token-set Jaccard ≥ 0.7),
  * sharing nothing with the production plan but the published
  * constants (Perms, HashMod, md5 token hash) — so a compression or
  * mask bug cannot cancel out of both sides.
  */
class MinhashMiddleStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = graft.functions.TextFns.HashMod

  /** Driver-side twin of TextFns.tokHash: first 15 md5 hex chars mod P. */
  private def tokHash(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % P
  }

  private def minhashes(set: Set[String]): IndexedSeq[Long] = {
    val hs = set.map(tokHash)
    Extras.Perms.map { case (_, a, b) => hs.map(h => (a * h + b) % P).min }.toIndexedSeq
  }

  /** Shared harness: write the corpus, run x02, compare against the
    * driver-side replay, and assert the planted structure surfaced.
    */
  private def checkAgainstReplay(tag: String, vocab: IndexedSeq[String],
      docs: Seq[(Long, String)]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Extras.x02DedupMinhashLsh(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val sets = docs.map { case (d, text) => d -> text.split(" ").toSet }
    val sigs = sets.map { case (d, s) => (d, s, minhashes(s)) }
    val expected = (for {
      (d1, s1, m1) <- sigs
      (d2, s2, m2) <- sigs
      if d1 < d2
      collides = (0 until 4).exists { b =>
        m1(4 * b) * P + m1(4 * b + 1) == m2(4 * b) * P + m2(4 * b + 1) &&
        m1(4 * b + 2) * P + m1(4 * b + 3) == m2(4 * b + 2) * P + m2(4 * b + 3)
      }
      if collides
      j = (s1 & s2).size.toDouble / (s1 | s2).size
      if j >= Extras.MinhashJaccardThreshold
    } yield (d1, d2, j)).sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)).toSeq ==
      got.map(p => (p._1, p._2)).toSeq.sorted, "output ordered by (d1, d2)")
    assert(got.sortBy(p => (p._1, p._2)) === expected)
    val keys = got.map(p => (p._1, p._2)).toSet
    assert(keys((500L, 501L)) && keys((500L, 503L)) && keys((501L, 503L)))
    assert(keys((500L, 502L)) && keys((510L, 511L)))
    assert(got.collect { case (500L, 501L, j) => j } === Seq(1.0))
  }

  test("x02 middle strategy matches a driver-side semantic replay at vocab=150") {
    val vocab = (0 until 150).map(i => f"w$i%03d")
    val rnd = new scala.util.Random(11)
    val randomDocs = (0L until 200L).map { d =>
      d -> rnd.shuffle(vocab).take(5 + rnd.nextInt(20)).mkString(" ")
    }
    val planted = Seq(
      500L -> vocab.take(10).mkString(" "),          // group seed
      501L -> vocab.take(10).mkString(" "),          // identical text
      502L -> vocab.take(9).mkString(" "),           // J = 9/10 vs 500
      503L -> vocab.take(10).reverse.mkString(" "),  // same SET, other order
      510L -> vocab.slice(80, 100).mkString(" "),
      511L -> (vocab.slice(80, 99) :+ vocab(120)).mkString(" ")) // J = 19/21 ≈ 0.905
    // sanity: this corpus really exercises the middle strategy
    assert(vocab.size > 64 && vocab.size <= 1024)
    checkAgainstReplay("x02mid", vocab, randomDocs ++ planted)
  }

  test("x02 open-vocab strategy (vocab>1024) matches the same replay, dup groups included") {
    val vocab = (0 until 1100).map(i => f"v$i%04d")
    val rnd = new scala.util.Random(29)
    val randomDocs = (0L until 150L).map { d =>
      d -> rnd.shuffle(vocab).take(6 + rnd.nextInt(24)).mkString(" ")
    }
    val planted = Seq(
      500L -> vocab.take(10).mkString(" "),
      501L -> vocab.take(10).mkString(" "),          // identical text
      502L -> vocab.take(9).mkString(" "),           // J = 0.9
      503L -> vocab.take(10).reverse.mkString(" "),  // same SET, other order
      510L -> vocab.slice(600, 620).mkString(" "),
      511L -> (vocab.slice(600, 619) :+ vocab(1050)).mkString(" "))
    // sanity: above every mask strategy — the open path with the
    // r10 identical-set compression is in play
    assert(vocab.size > 1024)
    checkAgainstReplay("x02open", vocab, randomDocs ++ planted)
  }
}
