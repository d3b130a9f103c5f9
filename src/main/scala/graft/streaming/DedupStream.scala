package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.storage.StorageLevel
import graft.operators.Dedup

/** Streaming incremental near-dup: the streaming twin of
  * [[graft.operators.Dedup.incrementalCandidatePairsMd5]]. Each
  * micro-batch of new documents is signed ONCE, joined against the
  * current stored band index for cross-batch candidates, unrolled for
  * in-batch pairs, and then its bands are ADDED to the index — so the
  * index grows with the corpus and every batch dedups against all
  * earlier ones.
  *
  * Exactness: every candidate pair is either within one batch (the
  * in-batch unroll finds it) or spans two batches (the later batch finds
  * it against the index, which already holds the earlier one) — so the
  * union of all emitted batches equals the FULL-corpus candidate set,
  * whatever the batch grouping (spec-asserted against
  * `minhashCandidatePairsMd5` over the whole corpus).
  *
  * Replay safety: foreachBatch is AT-LEAST-ONCE, and a plain parquet
  * append would duplicate rows on a batch retry. Both sinks therefore
  * write each batch into its own `batch_<id>` SUBDIRECTORY with
  * mode=overwrite — a replayed batch rewrites the same directory with
  * the same content, so the union read (`spark.read.parquet(root)`)
  * stays exact. Pass a durable `checkpointDir` to resume a source
  * incrementally across invocations; the default temp checkpoint
  * reprocesses the whole source (fine for one-shot runs and tests, and
  * still idempotent per batch content because batch ids restart at 0
  * over the same files).
  *
  * Per-batch cost: ONE signature pass over the batch (persisted and
  * reused for the pair join and the index write), one (band, band_key)
  * equi-join against the index. q72 / INCPROOF_r3.json measure the
  * batch-side equivalent.
  */
object DedupStream {

  private val indexSchema = new StructType()
    .add("__id", LongType).add("band", IntegerType).add("band_key", StringType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run an AvailableNow pass over `newDocs` (a streaming DataFrame of
    * (idCol, textCol)), writing candidate pairs under `pairsPath` and
    * each batch's bands under `indexPath` (both as per-batch
    * subdirectories; read either with
    * `spark.read.option("recursiveFileLookup", "true").parquet(<root>)`).
    * Bootstrap: a missing index root is seeded empty, checked through
    * the Hadoop FileSystem API so object-store/HDFS paths work too.
    */
  def candidatesAvailableNow(newDocs: DataFrame, indexPath: String, pairsPath: String,
                             textCol: String, idCol: String,
                             checkpointDir: Option[String] = None): Unit = {
    val spark = newDocs.sparkSession
    val indexRoot = new org.apache.hadoop.fs.Path(indexPath)
    if (!fs(spark, indexPath).exists(indexRoot)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
        .write.mode("overwrite").parquet(s"$indexPath/bootstrap")
    }
    val q = newDocs.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the index state — a temp checkpoint
      // would restart batch ids and overwrite batch_0 beside older
      // segments, duplicating bands across the LSM index
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexPath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        // sign the batch ONCE; both consumers below reuse this
        val newBands = Dedup.minhashBandIndexMd5(batch, textCol, idCol)
          .select("__id", "band", "band_key")
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
        // per-batch subdirs are NOT partition dirs — recurse explicitly,
        // with the schema pinned (the bootstrap dir may be all-empty)
        val index = session.read.schema(indexSchema)
          .option("recursiveFileLookup", "true").parquet(indexPath)
        // pairs FIRST, band write SECOND — writing the bands before the
        // pairs job would double-count this batch against itself via the
        // re-read index
        Dedup.incrementalCandidatesFromBands(newBands, index)
          .write.mode("overwrite").parquet(s"$pairsPath/batch_$batchId")
        newBands.write.mode("overwrite").parquet(s"$indexPath/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
