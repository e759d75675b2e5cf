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
}
