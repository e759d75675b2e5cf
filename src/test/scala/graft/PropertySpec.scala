package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.UnicodeUnescape
import graft.operators.Multimodal

/** Property-based checks (SURVEY §5.2.4) for the pure-JVM pieces —
  * plain ScalaCheck driven from ScalaTest (the scalatestplus bridge is
  * not in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("unicode decode is identity on backslash-free strings") {
    check(Prop.forAll(Gen.asciiPrintableStr.map(_.replace("\\", ""))) { s =>
      UnicodeUnescape.decode(s) == s
    })
  }

  test("unicode decode is idempotent when no escapes remain") {
    check(Prop.forAll(Gen.listOf(
        Gen.oneOf(Gen.const("\\u0041"), Gen.const("\\x7a"), Gen.alphaNumStr))
        .map(_.mkString)) { s =>
      val once = UnicodeUnescape.decode(s)
      UnicodeUnescape.decode(once) == once
    })
  }

  test("stub decoder is deterministic and in range") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val row = Multimodal.AssetRow(1L, "text/plain", s.getBytes("UTF-8"))
      val f1 = Multimodal.decodeStub(Iterator(row)).next()
      val f2 = Multimodal.decodeStub(Iterator(row)).next()
      f1 == f2 &&
        f1.fake_width >= 1 && f1.fake_width <= 640 &&
        f1.fake_height >= 1 && f1.fake_height <= 480 &&
        f1.byte_len == s.getBytes("UTF-8").length
    })
  }

  test("frame sampler caps fan-out at maxFrames and covers frame 0") {
    check(Prop.forAll(Gen.alphaStr, Gen.chooseNum(1, 16)) { (s, cap) =>
      val row = Multimodal.AssetRow(7L, "video/mp4", s.getBytes("UTF-8"))
      val frames = Multimodal.frameSampleStub(cap)(Iterator(row)).toList
      val nFrames = s.getBytes("UTF-8").length.toLong / 40L + 1L
      frames.nonEmpty && frames.size <= cap &&
        frames.head.frame_idx == 0L &&
        frames.forall(f => f.frame_idx < nFrames && f.ts_ms == f.frame_idx * 40L) &&
        // uniform stride: consecutive sampled indices differ by ceil(n/cap)
        frames.sliding(2).forall {
          case List(a, b) => b.frame_idx - a.frame_idx == (nFrames + cap - 1) / cap
          case _ => true
        }
    })
  }

  test("aspect-fit resize stays in the box, floors at 1, keeps orientation") {
    check(Prop.forAll(Gen.chooseNum(1L, 640L), Gen.chooseNum(1L, 480L)) { (w, h) =>
      val f = Multimodal.AssetFeatures(1L, "image/png", 10L, "d41d8cd9", w, h)
      val r = Multimodal.resizeStub(224L)(Iterator(f)).next()
      r.out_w >= 1 && r.out_w <= 224 && r.out_h >= 1 && r.out_h <= 224 &&
        // the longer input side maps to the longer (or equal) output side
        (w >= h) == (r.out_w >= r.out_h) &&
        // the longest side fills the box exactly
        math.max(r.out_w, r.out_h) == 224
    })
  }

  test("audio rollup geometry is exact and silence is bounded by windows") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val row = Multimodal.AssetRow(3L, "audio/pcm", s.getBytes("UTF-8"))
      val a1 = Multimodal.audioFeatureStub(Iterator(row)).next()
      val a2 = Multimodal.audioFeatureStub(Iterator(row)).next()
      val n = s.getBytes("UTF-8").length.toLong
      a1 == a2 &&
        a1.n_samples == n &&
        a1.duration_ms == n * 1000 / 8000 &&
        a1.n_rs == (n + 3) / 4 &&
        a1.n_windows == (n + 99) / 100 &&
        a1.n_silent >= 0 && a1.n_silent <= a1.n_windows
    })
  }

  test("centroid merge is associative (within fp tolerance)") {
    val a = graft.functions.VectorFns.CentroidAgg
    val vGen = Gen.listOfN(4, Gen.chooseNum(-10f, 10f)).map(_.toArray)
    check(Prop.forAll(Gen.listOfN(3, vGen)) { vs =>
      def buf(v: Array[Float]) = a.reduce(a.zero, v)
      val m1 = a.finish(a.merge(buf(vs(0)), a.merge(buf(vs(1)), buf(vs(2)))))
      val m2 = a.finish(a.merge(a.merge(buf(vs(0)), buf(vs(1))), buf(vs(2))))
      m1.zip(m2).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    })
  }

  test("minhash permutation constants stay in overflow-safe range") {
    val maxTh = graft.functions.TextFns.HashMod - 1
    graft.queries.Extras.Perms.foreach { case (_, aa, bb) =>
      assert(BigInt(aa) * maxTh + bb < BigInt(Long.MaxValue))
    }
  }

  test("morton interleave is a bijection on the cell grid") {
    // decode by de-interleaving must recover the input cells — a
    // collision or dropped bit would silently merge distinct grid
    // cells into one curve position (weaker pruning, no error)
    def decode(k: Long, n: Int, bits: Int): Seq[Long] =
      (0 until n).map { i =>
        (0 until bits).map(b => ((k >> (b * n + i)) & 1L) << b).sum
      }
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cellGen = Gen.choose(0L, 1023L)
    val triples = Gen.listOfN(300,
      Gen.zip(cellGen, cellGen, cellGen)).sample.get
    val keys = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.operators.ZOrder.interleave(
          Seq(col("a"), col("b"), col("c")), 10).as("k"))
      .collect()
    keys.foreach { r =>
      assert(decode(r.getLong(3), 3, 10) ==
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"roundtrip failed for ${r.toSeq}")
    }
  }

  test("GlobalOrder equals the single-partition row_number on random frames") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // several shapes: singleton, collision-heavy tiny tier space, larger;
    // every shape carries some NULL keys (they must keep flowing through
    // the bucket join and sort first within their tier, like the naive form)
    for ((n, tiers) <- Seq((1, 1), (37, 2), (400, 5))) {
      val df = (1L to n.toLong).toDF("id")
        .withColumn("tier", pmod(col("id") * 7919, lit(tiers)).cast("long"))
        .withColumn("skey", when(pmod(col("id"), lit(11)) === 0, lit(null))
          .otherwise(md5(concat(lit("seed:"), col("id").cast("string")))))
      val fast = graft.operators.GlobalOrder
        .withPosition(df, "tier", "skey", "id")
        .select(col("id"), col("pos")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the deliberately-naive single-partition reference form;
      // constant-partitioned (non-foldable pmod(hash,1) ≡ 0) only to
      // keep the test log free of the WindowExec warning — same
      // semantics: one global group
      val slow = df.select(col("id"),
          row_number().over(
            Window.partitionBy(pmod(hash(col("id")), lit(1)))
              .orderBy(col("tier"), col("skey"), col("id")))
            .cast("long").as("pos")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == slow, s"divergence at n=$n tiers=$tiers")
    }
  }

  test("setIdentity is injective over an adversarial token alphabet") {
    // Exhaustive over every array of length <= 3 drawn from pieces
    // built to confuse a separator-based encoding: NUL itself,
    // NUL-composites (the ADVICE r10 collision ["a<NUL>b"] vs
    // ["a","b"]), the length-prefix delimiter ':', digit tokens that
    // could merge into a length field, and the empty token (legal
    // output of a double-space split). 585 distinct arrays must yield
    // 585 distinct fingerprints.
    val spark = TestSpark.spark
    import spark.implicits._
    val pieces = Seq("a", "b", "\u0000", ":", "1", "10", "a\u0000b", "")
    val arrays: Seq[Seq[String]] =
      Seq(Seq.empty[String]) ++
        pieces.map(Seq(_)) ++
        (for (x <- pieces; y <- pieces) yield Seq(x, y)) ++
        (for (x <- pieces; y <- pieces; z <- pieces) yield Seq(x, y, z))
    assert(arrays.distinct.size == arrays.size)
    val n = arrays.size
    val distinctIds = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
      .select(graft.functions.TextFns.setIdentity(org.apache.spark.sql.functions.col("arr")).as("h"))
      .distinct().count()
    assert(distinctIds == n, s"expected $n distinct fingerprints, got $distinctIds")
  }

  test("PII scrub is idempotent and leaves clean text untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def scrub(ss: Seq[String]): Seq[String] =
      ss.toDF("v").select(graft.functions.Sanitize.scrubPii(col("v")))
        .collect().map(_.getString(0)).toSeq
    val pii = Seq("a@b.co", "+1-555-0042", "10.0.0.1", "4242 4242 4242 4242")
    val wordGen = Gen.listOfN(3, Gen.alphaStr.map(_.take(6))).map(_.mkString(" "))
    val dirtyGen = for {
      w1 <- wordGen; p <- Gen.oneOf(pii); w2 <- wordGen
    } yield s"$w1 $p $w2"
    // batch the property: collect a sample of inputs, one Spark job
    val samples = Gen.listOfN(120, dirtyGen).sample.get ++
      Gen.listOfN(40, wordGen).sample.get
    val once = scrub(samples)
    val twice = scrub(once)
    assert(once == twice, "scrub must be idempotent")
    samples.zip(once).foreach { case (in, out) =>
      if (!pii.exists(in.contains)) assert(out == in, s"clean '$in' changed")
      else assert(out.contains("<"), s"pii in '$in' not redacted")
    }
  }
}
