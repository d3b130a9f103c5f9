package graft

/** Every SparkEntry query must run and return rows on sf0.001 — mirrors the
  * driver's rows-only check for non-oracle queries and catches regressions
  * in queries whose oracle runs only driver-side.
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle SQL without query impl: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs with rows > 0") {
      assert(fn(spark, dir).count() > 0, s"$name returned no rows")
    }
  }
}
