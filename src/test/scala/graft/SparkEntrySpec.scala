package graft

/** The driver's smoke contract: `SparkEntry.entry` must return rows > 0 on
  * sf0.001 — pinned here so a testdata or format drift (the round-8
  * events regeneration) surfaces in the suite, not first in the driver.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on the sf0.001 testdata (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and every oracle points at a query") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.length == names.length)
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
