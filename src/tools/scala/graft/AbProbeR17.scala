package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r17 interleaved A/B harness: time named OLD/NEW DataFrame variants of
  * one operator through the noop sink, alternating old/new within the same
  * minutes (the r16 measurement doctrine — host drift between sessions is
  * ±40% on sub-5 s pipelines, so only interleaved pairs are comparable).
  * `runMain graft.AbProbeR17 <case> [sfDir] [cpus] [reps]`.
  * Measurement only; never part of a query path.
  */
object AbProbeR17 {
  def main(args: Array[String]): Unit = {
    val caseName = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.length > 3) args(3).toInt else 3
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "262144"))
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables(spark, sfDir).documents
    def q187Body(d: DataFrame, threshold: Long): DataFrame = {
      val trained = graft.operators.Bpe.trainSampled(d, "text", "doc_id",
          nMerges = 8, fraction = 0.10, driverThreshold = threshold)
        .orderBy("merge_rank").collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
      graft.queries.DocQueries.bpePackedWithMerges(d, trained)
    }
    // each case yields (old, new) CONSTRUCTORS so eager-at-construction
    // work (train's collect rounds) is inside the timed region, exactly
    // like Bench timing fn(spark, sfDir)
    val cases: Map[String, (() => DataFrame, () => DataFrame)] = Map(
      "bpe_train_sampled" -> (
        () => graft.operators.Bpe.trainSampled(docs, "text", "doc_id",
          nMerges = 8, fraction = 0.10, driverThreshold = 0L),
        () => graft.operators.Bpe.trainSampled(docs, "text", "doc_id",
          nMerges = 8, fraction = 0.10)),
      // the FULL q187 body (train + encode + vocab + pack), old = the
      // distributed train loop forced via driverThreshold = 0
      "q187_full" -> (
        () => q187Body(docs, 0L),
        () => q187Body(docs, 1L << 21))
    )
    val (oldFn, newFn) = cases.getOrElse(caseName,
      sys.error(s"unknown case $caseName; have ${cases.keys.mkString(", ")}"))

    def timeOne(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    // warm both sides once (JIT/codegen), untimed
    timeOne(oldFn); timeOne(newFn)
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { r =>
      if (r % 2 == 1) { olds += timeOne(oldFn); news += timeOne(newFn) }
      else { news += timeOne(newFn); olds += timeOne(oldFn) }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    println(f"\n=== A/B $caseName reps=$reps ===")
    println(f"old: med=${med(olds.toSeq)}%.3f runs=${olds.map(x => f"$x%.3f").mkString(",")}")
    println(f"new: med=${med(news.toSeq)}%.3f runs=${news.map(x => f"$x%.3f").mkString(",")}")
    println(f"ratio new/old: ${med(news.toSeq) / med(olds.toSeq)}%.3f")
    Sessions.release(spark, owned)
  }
}
