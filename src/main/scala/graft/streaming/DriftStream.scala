package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Drift

/** Streaming drift monitoring — the operational twin of the q134 batch
  * measurement ([[graft.operators.Drift.numericDrift]]): the accepted
  * corpus's value histogram is stored ONCE as baseline state, and every
  * arriving micro-batch (1) appends its own quantized (value → count)
  * partial histogram and (2) re-measures PSI/KS of the ACCUMULATED
  * incoming snapshot against the stored baseline — the continuous "has
  * the incoming crawl shifted?" gauge a training-data intake runs.
  *
  * Per-batch cost is O(batch + distinct values), never O(corpus): the
  * baseline corpus is never rescanned (its histogram IS the state — the
  * [[IndexStream]] LSM principle applied to a histogram: per-batch
  * segments, merge-on-read via one value-keyed aggregation), and the
  * measurement runs off count tables through
  * [[Drift.driftFromCounts]]. Fed the same rows, the batch-N report is
  * BYTE-IDENTICAL to a one-shot `numericDrift(baseline, batches 1..N)`
  * (spec-asserted): the stream and the batch job are the same program at
  * different cadences.
  *
  * Replay safety follows [[DedupStream]]: every write lands in its own
  * `batch_<id>` subdirectory with mode=overwrite, so an at-least-once
  * retry rewrites identical content and the merge-on-read union stays
  * exact.
  */
object DriftStream {

  /** Store the baseline histogram under `statePath/baseline`: the
    * quantized (value → count) table of the accepted corpus. Run once;
    * the per-batch monitor refuses to start without it.
    */
  def seedBaseline(base: DataFrame, statePath: String, valueCol: String,
                   quantizeDecimals: Int = 6): Unit =
    base
      .select(round(col(valueCol).cast("double"), quantizeDecimals).as("__v"))
      .where(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$statePath/baseline")

  /** Run an AvailableNow monitoring pass over `newRows` (a streaming
    * DataFrame carrying `valueCol`): per batch, append the batch's
    * histogram segment under `statePath/cur/batch_<id>` and write one
    * drift report row (batch_id, n_base, n_cur, n_distinct, psi, ks) —
    * accumulated-so-far vs baseline — under `reportPath/batch_<id>`.
    */
  def monitorAvailableNow(newRows: DataFrame, statePath: String, reportPath: String,
                          valueCol: String, buckets: Int = 10,
                          quantizeDecimals: Int = 6,
                          checkpointDir: Option[String] = None): Unit = {
    val spark0 = newRows.sparkSession
    val seedPath = new org.apache.hadoop.fs.Path(s"$statePath/baseline")
    require(seedPath.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(seedPath),
      s"drift state at $statePath is not seeded — run DriftStream.seedBaseline first")
    val q = newRows.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // 1. the batch's own histogram segment (replay-safe overwrite)
        batch
          .select(round(col(valueCol).cast("double"), quantizeDecimals).as("__v"))
          .where(col("__v").isNotNull)
          .groupBy("__v").agg(count(lit(1)).as("cnt"))
          .write.mode("overwrite").parquet(s"$statePath/cur/batch_$batchId")
        // 2. merge-on-read: accumulated incoming histogram vs baseline
        val baseH = spark.read.parquet(s"$statePath/baseline")
          .groupBy("__v").agg(sum(col("cnt")).as("cb"))
        val curH = spark.read.option("recursiveFileLookup", "true")
          .parquet(s"$statePath/cur")
          .groupBy("__v").agg(sum(col("cnt")).as("cc"))
        val counts = baseH
          .join(curH, Seq("__v"), "full_outer")
          .select(col("__v"),
            coalesce(col("cb"), lit(0L)).as("cb"),
            coalesce(col("cc"), lit(0L)).as("cc"))
        Drift.driftFromCounts(counts, buckets)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$reportPath/batch_$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }
}
