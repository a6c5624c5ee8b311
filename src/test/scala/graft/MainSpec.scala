package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument handling (no SparkSession needed). */
class MainSpec extends AnyFunSuite {

  test("health args: absent, chainTip-only (default SLO), explicit maxLag") {
    assert(Main.parseHealthArgs(Nil) == Right(None))
    assert(Main.parseHealthArgs(List("5000")) == Right(Some((5000L, 1000L))))
    assert(Main.parseHealthArgs(List("5000", "50")) == Right(Some((5000L, 50L))))
  }

  test("health args: malformed numbers are usage errors, not stack traces") {
    assert(Main.parseHealthArgs(List("banana")).isLeft)
    assert(Main.parseHealthArgs(List("5000", "banana")).isLeft)
    assert(Main.parseHealthArgs(List("12x")).isLeft)
  }
}
