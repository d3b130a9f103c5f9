package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import graft.operators.Multimodal

/** Streaming perceptual near-dup — [[DedupStream]]'s pattern for the
  * media family: each micro-batch of (media_id, ahash) rows joins its
  * band decomposition against the STORED band index for cross-batch
  * pairs, unrolls its own in-batch pairs, and appends its bands as the
  * next index segment. The union of all emitted batches equals the
  * full-corpus [[Multimodal.hamming64NearDupPairs]] whatever the batch
  * grouping (spec-asserted on the planted block corpus) — every pair is
  * either in-batch or spans two batches, and the later batch's index
  * join finds the spanning ones.
  *
  * Per-batch cost: O(batch · bands) band rows + one (band, v) equi-join
  * against the index — assets already ingested are never re-hashed or
  * re-banded. Replay safety follows [[DedupStream]]: per-batch
  * `batch_<id>` subdirectories with mode=overwrite, so an at-least-once
  * retry rewrites identical content.
  */
object MediaHashStream {

  private val indexSchema = new StructType()
    .add("__id", LongType).add("__h", LongType)
    .add("band", IntegerType).add("v", LongType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run an AvailableNow pass over `newHashes` (a streaming DataFrame of
    * (idCol, hashCol)), writing confirmed pairs under `pairsPath` and
    * growing the band index under `indexPath`.
    */
  def dedupAvailableNow(newHashes: DataFrame, indexPath: String, pairsPath: String,
                        idCol: String, hashCol: String, maxHamming: Int = 3,
                        checkpointDir: Option[String] = None): Unit = {
    val q = newHashes.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the index state — a temp checkpoint
      // would restart batch ids and overwrite batch_0 beside older
      // segments, duplicating hashes across the LSM index
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexPath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val hashes = batch.select(col(idCol), col(hashCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val root = new org.apache.hadoop.fs.Path(indexPath)
        val index =
          if (fs(spark, indexPath).exists(root))
            spark.read.schema(indexSchema)
              .option("recursiveFileLookup", "true").parquet(indexPath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
        Multimodal.hamming64NearDupsIncremental(hashes, index, idCol, hashCol, maxHamming)
          .write.mode("overwrite").parquet(s"$pairsPath/batch_$batchId")
        Multimodal.bandedHashes(hashes, idCol, hashCol, maxHamming)
          .write.mode("overwrite").parquet(s"$indexPath/batch_$batchId")
        hashes.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }
}
