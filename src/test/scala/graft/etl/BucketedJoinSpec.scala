package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: two tables bucketed identically on the
  * join key must join with no Exchange on either side — the strategy
  * SCALE.md prescribes for fact⋈fact joins too big to broadcast.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("equal-bucketed tables join with zero shuffle and correct results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val wh = ParquetWarehouse(spark, dir)
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    wh.writeBucketed("b_orders", orders, 4, Seq("o_orderkey"), Seq("o_orderkey"))
    wh.writeBucketed("b_lineitem", lineitem, 4, Seq("l_orderkey"), Seq("l_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
      val joined = wh.readTable("b_lineitem")
        .join(wh.readTable("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // same answer as the plain (shuffling) join over the raw files
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
