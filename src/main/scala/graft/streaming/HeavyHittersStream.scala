package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.operators.HeavyHitters

/** Streaming heavy-hitter maintenance: the streaming twin of q204's
  * incremental count-state merge, keeping the frequency-mining family on
  * the repo invariant (every incremental family has its LSM streaming
  * twin — dedup/index/ANN/ER/media/substring-strip/vocab/unigram/DBSCAN
  * all have theirs). Each micro-batch appends its own EXACT token-count
  * table as an LSM segment tagged `seg = batch_<id>`; the current heavy
  * hitters are [[HeavyHitters.fromSegments]] over the segments — the
  * partition-pigeonhole theorem lifted to segments, so the served set is
  * byte-identical to the full batch recompute for EVERY batch split,
  * with no monotone-ingest assumption (token counts are additive over
  * any document partition, the [[VocabStream]] class of twin).
  *
  * Replay safety: per-batch `batch_<id>` subdirectories with
  * mode=overwrite (the [[DedupStream]] contract) — an at-least-once
  * retry rewrites identical content (counts are a deterministic function
  * of the batch), so the serving fold stays exact. Compaction =
  * per-token sum of any subset of segments under one new seg tag
  * (associative + commutative), which only TIGHTENS the candidate
  * filter (the pigeonhole holds over every coarsening of the
  * segmentation).
  */
object HeavyHittersStream {

  private val countsSchema = new StructType()
    .add("seg", StringType).add("tok", StringType).add("cnt", LongType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run an AvailableNow pass over `newDocs` (a streaming DataFrame with
    * `textCol`), appending each batch's exact token counts under
    * `countsPath/batch_<id>`. A missing counts root bootstraps empty.
    */
  def countsAvailableNow(newDocs: DataFrame, countsPath: String,
                         textCol: String,
                         checkpointDir: Option[String] = None): Unit = {
    val spark = newDocs.sparkSession
    val root = new org.apache.hadoop.fs.Path(countsPath)
    if (!fs(spark, countsPath).exists(root)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countsSchema)
        .write.mode("overwrite").parquet(s"$countsPath/bootstrap")
    }
    val q = newDocs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$countsPath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        HeavyHitters.textTokenCounts(batch, textCol)
          .select(lit(s"batch_$batchId").as("seg"), col("tok"), col("cnt"))
          .write.mode("overwrite").parquet(s"$countsPath/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** The servable heavy hitters off the LSM segments: the
    * [[HeavyHitters.fromSegments]] segment-pigeonhole read — candidate
    * shuffle ∝ segments·k, never the distinct-token state.
    */
  def heavyFromSegments(spark: org.apache.spark.sql.SparkSession, countsPath: String,
                        k: Int): DataFrame =
    HeavyHitters.fromSegments(
      spark.read.schema(countsSchema)
        .option("recursiveFileLookup", "true").parquet(countsPath),
      k)
}
