package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ShingleHash64

/** Property-based tests (SURVEY §5.3) over the pure kernels — no Spark
  * session needed, so these generate hundreds of cases cheaply. */
class PropertySpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }
  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  test("full rolling hash equals the direct fold definition") {
    check(Prop.forAll(bytesGen) { bs =>
      val ref = bs.foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
      ShingleHash64.hash(bs, 0) == ref
    })
  }

  test("min-shingle hash is the min over all window hashes") {
    val gen = for {
      bs <- bytesGen if bs.length >= 4
      k <- Gen.chooseNum(1, math.min(16, bs.length - 1))
    } yield (bs, k)
    check(Prop.forAll(gen) { case (bs, k) =>
      val windows = bs.sliding(k).filter(_.length == k).map(w =>
        w.foldLeft(0L)((h, b) => h * 31L + (b & 0xff))).toSeq
      windows.isEmpty || ShingleHash64.hash(bs, k) == windows.min
    })
  }

  test("k >= length degrades to the full-document hash") {
    check(Prop.forAll(bytesGen) { bs =>
      ShingleHash64.hash(bs, bs.length + 1) == ShingleHash64.hash(bs, 0)
    })
  }

  test("equal content implies equal fingerprints (pure function)") {
    check(Prop.forAll(bytesGen) { bs =>
      ShingleHash64.hash(bs.clone(), 8) == ShingleHash64.hash(bs, 8)
    })
  }
}
