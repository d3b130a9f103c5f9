package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.etl.{Scd2, Warehouse}

/** Streaming SCD Type-2 maintenance — [[IncrementalLoad]]'s history-
  * keeping sibling: where mergeAvailableNow applies latest-wins upserts
  * (Type 1, old values gone), this twin routes each micro-batch of
  * changed dimension rows through [[Scd2.merge]], so every attribute
  * change lands as a close + reopen and the full validity history
  * accumulates behind the warehouse's atomic manifest flip (readers see
  * the pre- or post-batch generation, never a mixture).
  *
  * Micro-batches are CDC-shaped — the keys that CHANGED, not a full
  * snapshot — so the merge runs with `closeMissing = false` (a key
  * absent from a batch is simply unmentioned, not deleted). Deletions,
  * when the feed carries them, are a batch that re-states the key with
  * its tombstone attribute — the standard CDC convention.
  *
  * Effective dates come from an injectable `dateForBatch(batchId)` (the
  * F10 clock doctrine — never wall-clock inside the stream), which also
  * makes replay IDEMPOTENT: re-running a batch re-merges the same
  * snapshot at the same date, where every row classifies as unchanged
  * and the rewritten generation is content-identical (spec-asserted).
  *
  * Scale shape per batch: ONE full-outer key join of the OPEN slice
  * against the batch (history unions through untouched — see Scd2) and
  * one generation write; nothing rescans history.
  */
object Scd2Stream {

  /** First load: write the initial SCD2 generation for `name`. */
  def seed(snapshot: DataFrame, wh: Warehouse, name: String,
           keyCols: Seq[String], trackedCols: Seq[String], loadDate: String): Unit =
    wh.write(name, Scd2.initial(snapshot, keyCols, trackedCols, loadDate))

  /** Run an AvailableNow pass over `changes` (a streaming DataFrame of
    * key-unique changed rows carrying keyCols + trackedCols): each batch
    * merges into warehouse table `name` at `dateForBatch(batchId)`.
    */
  def mergeAvailableNow(changes: DataFrame, wh: Warehouse, name: String,
                        keyCols: Seq[String], trackedCols: Seq[String],
                        dateForBatch: Long => String,
                        checkpointDir: Option[String] = None): Unit = {
    val q = changes.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir.getOrElse(
        java.nio.file.Files.createTempDirectory(s"ckpt-scd2-$name").toString))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val current = wh.read(name)
        wh.write(name, Scd2.merge(current, batch, keyCols, trackedCols,
          dateForBatch(batchId), closeMissing = false))
      }
      .start()
    q.awaitTermination()
  }
}
