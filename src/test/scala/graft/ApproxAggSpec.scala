package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch-based scale path next to the exact
  * queries: q19's exact percentiles sort each group; approx_percentile
  * streams a bounded sketch, and approx_count_distinct (HLL++) replaces
  * the exact distinct shuffle. Both are map-side-combinable with O(sketch)
  * state per partition, which is what survives a 100 TB GROUP BY. No
  * DuckDB oracle — the sketches are engine-specific — so the contract
  * pinned here is the error bound against the exact answers (the KMV
  * query q58 carries the engine-portable, oracle-checked variant).
  */
class ApproxAggSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile lands within 1% relative error of the exact percentile") {
    val li = sources.Tables(spark, dir).lineitem
    val rows = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("apx"),
      expr("percentile(l_extendedprice, 0.5)").as("exact")).head()
    val (apx, exact) = (rows.getDouble(0), rows.getDouble(1))
    assert(math.abs(apx - exact) / exact < 0.01, s"apx=$apx exact=$exact")
  }

  test("approx_count_distinct within 5% of exact (HLL++ rsd default 0.05)") {
    val li = sources.Tables(spark, dir).lineitem
    val rows = li.agg(
      approx_count_distinct(col("l_partkey")).as("apx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (apx, exact) = (rows.getLong(0), rows.getLong(1))
    assert(math.abs(apx - exact).toDouble / exact < 0.05, s"apx=$apx exact=$exact")
  }

  test("per-group approx percentiles track exact within 2%") {
    val li = sources.Tables(spark, dir).lineitem
    val got = li.groupBy("l_returnflag").agg(
        percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("apx"),
        expr("percentile(l_quantity, 0.9)").as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (apx, exact) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(apx - exact) / math.max(exact, 1e-9) < 0.02,
        s"flag=${r.getString(0)}: apx=$apx exact=$exact")
    }
  }
}
