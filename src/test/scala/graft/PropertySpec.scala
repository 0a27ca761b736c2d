package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderImpl

/** Pure-JVM property tests for the native kernels (no SparkSession). */
class PropertySpec extends AnyFunSuite {

  private def check(p: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  /** Inverse of the interleave: collect even (x) and odd (y) bits. */
  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("zorder interleave is a bijection on bits x bits") {
    val coord = Gen.chooseNum(0L, (1L << 20) - 1)
    check(forAll(coord, coord) { (x, y) =>
      deinterleave(ZOrderImpl.interleave(x, y, 20), 20) == ((x, y))
    })
  }

  test("zorder masks high bits: only the low `bits` of each dim matter") {
    val any = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    check(forAll(any, any) { (x, y) =>
      ZOrderImpl.interleave(x, y, 10) ==
        ZOrderImpl.interleave(x & 1023, y & 1023, 10)
    })
  }

  test("zorder output stays within 2*bits bits and grows with either dim's high bit") {
    val coord = Gen.chooseNum(0L, (1L << 16) - 1)
    check(forAll(coord, coord) { (x, y) =>
      val z = ZOrderImpl.interleave(x, y, 16)
      z >= 0 && z < (1L << 32)
    })
  }
}
