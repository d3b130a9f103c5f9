package graft

import org.apache.spark.sql.functions._

/** Pins that Spark 4.1's runtime bloom-filter injection fires for the
  * engine's fact⋈dim shape: a selective predicate on the dim side makes
  * the optimizer build a bloom filter over the dim join keys and push a
  * `BloomFilterMightContain` probe into the FACT scan — row-level runtime
  * pruning, the mechanism that keeps a 100-TB shuffled join from carrying
  * never-matching fact rows to the exchange.
  *
  * Local test sizes sit far under the production thresholds
  * (applicationSideScanSizeThreshold defaults to 10 GB), so the spec
  * lowers them; on a real cluster the defaults fire on exactly this plan
  * shape. Broadcast is disabled because a broadcast-hash-joined dim
  * already prunes at the probe side — the bloom path is the SHUFFLE-join
  * protection.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def withConfs[A](confs: Map[String, String])(body: => A): A = {
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom probe into the fact side of a shuffle join") {
    withConfs(Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"
    )) {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val joined = lineitem
        .join(orders.where(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate"))
        .agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.toLowerCase.contains("mightcontain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the result is unchanged by the runtime filter (no false negatives)
      val withFilter = joined.collect().map(r => (r.get(0), r.get(1))).toSet
      val plain = withConfs(Map(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
        lineitem
          .join(orders.where(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderdate"))
          .agg(sum(col("l_quantity")).as("qty"))
          .collect().map(r => (r.get(0), r.get(1))).toSet
      }
      assert(withFilter === plain)
    }
  }
}
