package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing at scale — the 100-TB form of an `ntile(n)` split.
  *
  * `ntile` ranks every row in ONE global sort window: a single task
  * receives the whole corpus (Spark warns `No Partition Defined for Window
  * operation`), which is exactly what must never happen at scale. The
  * approx form computes n-1 quantile cutoffs in one map-side-combinable
  * sketch pass (`percentile_approx`, bounded state) and assigns buckets by
  * comparison — two corpus scans, no global sort, no single-task stage.
  *
  * The price is edge fuzz: rows within the sketch's rank-accuracy band of
  * a cutoff can land one bucket off versus the exact split (and exact ties
  * always co-locate here, while ntile splits them arbitrarily to force
  * equal sizes). BucketingSpec quantifies the deviation against the exact
  * ntile on real LM scores.
  */
object Bucketing {

  /** Assign each row a bucket in [1, n] by DESCENDING `valueCol` (bucket 1
    * = highest values — q82's head/middle/tail orientation). Cutoffs are
    * the (n-1)/n .. 1/n approximate quantiles; `accuracy` is
    * percentile_approx's inverse-rank-error knob (10000 ≈ 0.01% rank
    * error).
    */
  def byApproxQuantilesDesc(df: DataFrame, valueCol: String, n: Int,
                            accuracy: Int = 10000): DataFrame = {
    require(n >= 2, s"need at least 2 buckets, got $n")
    val probs = array((1 until n).reverse.map(i => lit(i.toDouble / n)): _*)
    val cutoffs = df.agg(
      percentile_approx(col(valueCol), probs, lit(accuracy)).as("__cuts"))
    // one-row cutoff table broadcast-crossed in; bucket = 1 + #cutoffs the
    // value falls below (cutoffs descend, so the count is the rank band)
    df.join(broadcast(cutoffs))
      .withColumn("bucket",
        (lit(1) + size(filter(col("__cuts"), c => col(valueCol) < c))).cast("long"))
      .drop("__cuts")
  }

  /** Per-bucket rollup matching q82's report shape: volume and value range
    * of each bucket.
    */
  def bucketReport(bucketed: DataFrame, valueCol: String,
                   weightCol: Option[Column] = None): DataFrame =
    bucketed.groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        weightCol.map(w => sum(w).as("n_tokens"))
          .getOrElse(count(lit(1)).as("n_tokens")),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .orderBy("bucket")
}
