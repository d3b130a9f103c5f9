package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.operators.WordPiece

/** Streaming WordPiece-vocabulary maintenance: the streaming twin of
  * q197's incremental count-state merge, closing the tokenizer shelf's
  * streaming gap (dedup/index/ANN/ER/media/substring-strip all have
  * theirs). Each micro-batch appends its own substring-count table as an
  * LSM segment; the current vocabulary is one per-piece SUM fold over
  * the segments + the top-k rank — and because substring counts are
  * ADDITIVE over ANY document partition, the folded vocabulary equals
  * the full retrain EXACTLY for EVERY batch split, with no
  * monotone-ingest assumption at all (stronger than the dedup twins,
  * which need arrival order for their keep-first semantics).
  *
  * Replay safety: per-batch `batch_<id>` subdirectories with
  * mode=overwrite (the [[DedupStream]] contract) — an at-least-once
  * retry rewrites identical content, so the sum fold stays exact.
  * Compaction, when segments accumulate, is [[WordPiece.mergeCounts]]
  * over pairs of segments (associative + commutative), or simply the
  * fold itself materialized as a new single segment.
  */
object VocabStream {

  private val countsSchema = new StructType()
    .add("piece", StringType).add("cnt", LongType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run an AvailableNow pass over `newDocs` (a streaming DataFrame with
    * `textCol`), appending each batch's substring counts under
    * `countsPath/batch_<id>`. A missing counts root bootstraps empty.
    */
  def countsAvailableNow(newDocs: DataFrame, countsPath: String,
                         textCol: String, maxPieceLen: Int = 5,
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
        WordPiece.substringCounts(batch, textCol, maxPieceLen)
          .select(col("piece"), col("cnt").cast("long").as("cnt"))
          .write.mode("overwrite").parquet(s"$countsPath/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** The servable vocabulary off the LSM segments: one per-piece sum fold
    * + [[WordPiece.vocabFromCounts]]'s top-k rank.
    */
  def vocabFromSegments(spark: org.apache.spark.sql.SparkSession, countsPath: String,
                        vocabSize: Int): DataFrame =
    WordPiece.vocabFromCounts(
      spark.read.schema(countsSchema)
        .option("recursiveFileLookup", "true").parquet(countsPath)
        .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt")),
      vocabSize)
}
