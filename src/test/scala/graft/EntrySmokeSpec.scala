package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
