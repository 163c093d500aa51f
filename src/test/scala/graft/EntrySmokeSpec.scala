package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends AnyFunSuite {
  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("driver contract hygiene: every query is oracle-gated or a documented rows-only tier") {
    // a queries entry without an oracleSql row silently downgrades to
    // the driver's weaker rows-only check — only the two approximate
    // tiers (HLL q39, IVF q38; each with a hash-matched exact twin)
    // are allowed to be there
    val rowsOnlyByDesign = Set("q38_ivf_topk", "q39_dedup_approx")
    val ungated = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(ungated.isEmpty, s"queries with no oracle: $ungated")
    // and no orphan oracle: every oracleSql key must have a query
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles with no query: $orphans")
  }
}
