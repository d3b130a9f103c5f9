package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.etl.{Merge, Warehouse}

/** Streaming incremental warehouse load: MERGE each micro-batch into a
  * warehouse table instead of the reference's daily truncate-and-reload
  * (S2, dags/sri_vehiculos_etl_dag.py:99-114). At 100 TB the full daily
  * rewrite is the single most expensive habit to break: with
  * foreachBatch + MERGE only the day's changes move, and the base table
  * shuffles at most once per batch (zero times if bucketed on the key —
  * see etl.Merge scale notes).
  *
  * foreachBatch is the idiomatic Spark shape for "sink needs a batch-only
  * operation" (MERGE is not an incremental sink primitive); exactly-once
  * lands on the checkpoint + the MERGE's idempotence on replay: re-merging
  * the same batch leaves the table unchanged (MergeSpec pins this).
  */
object IncrementalLoad {

  /** Start (and await) an AvailableNow run that merges every micro-batch
    * of `updates` into warehouse table `name` keyed on `keyCols`. The
    * table must exist (bootstrap it with an empty or seed write). Batches
    * are deduplicated to one row per key before the merge — later rows in
    * the same batch win by `orderCol` descending (a batch can legitimately
    * carry several updates for one key; SQL MERGE would reject that, so
    * the stream collapses them first).
    */
  def mergeAvailableNow(updates: DataFrame, wh: Warehouse, name: String,
                        keyCols: Seq[String], orderCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = updates.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ckpt-merge-$name").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc)
        val latest = batch
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        // materialize BEFORE writing: Spark refuses to overwrite a path
        // that the lazy merge plan still reads (and would otherwise delete
        // the inputs out from under itself). This makes the parquet
        // warehouse copy-on-write per batch — inherent to plain parquet;
        // a table format with transactional MERGE (Delta/Iceberg) replaces
        // the rewrite with a metadata commit and is the drop-in upgrade.
        val merged = Merge.upsert(wh.read(name), latest, keyCols).localCheckpoint(true)
        wh.write(name, merged)
      }
      .start()
    q.awaitTermination()
  }
}
