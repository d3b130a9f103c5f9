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
  * operation" (MERGE is not an incremental sink primitive). Correctness
  * against disorder and replay comes from two guards, not from batch
  * boundaries:
  *   - within a batch, one row per key survives (latest by `orderCol`,
  *     tie-broken deterministically on the md5 of the full row
  *     serialization, smallest digest winning);
  *   - against the TABLE, an update is applied only when it is strictly
  *     newer than the stored row, OR equal on `orderCol` with a strictly
  *     smaller digest — the SAME tie-break as in-batch, so equal-orderCol
  *     rows split across batches (maxFilesPerTrigger) converge to the one
  *     global min-digest winner regardless of batch grouping or order.
  * Replaying any batch is therefore a no-op: every replayed row is either
  * older, or ties with a digest >= the stored winner's.
  */
object IncrementalLoad {

  /** Start (and await) an AvailableNow run that merges every micro-batch
    * of `updates` into warehouse table `name` keyed on `keyCols`. The
    * table must exist with an `orderCol` column (bootstrap it with an
    * empty or seed write). Pass `checkpointDir` for a durable checkpoint
    * that survives restarts (committed source offsets are not reprocessed);
    * the default temp dir is for tests and one-shot runs only.
    */
  def mergeAvailableNow(updates: DataFrame, wh: Warehouse, name: String,
                        keyCols: Seq[String], orderCol: String,
                        checkpointDir: Option[String] = None): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = updates.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir.getOrElse(
        java.nio.file.Files.createTempDirectory(s"ckpt-merge-$name").toString))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one row per key: latest orderCol wins; equal orderCol values are
        // tie-broken on the row's full serialization so replays of the
        // same batch pick the same winner every time
        val dataCols = batch.columns.toSeq
        val digest = md5(to_json(struct(dataCols.map(col): _*)))
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc, digest.asc)
        val latest = batch
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        val base = wh.read(name)
        // recency guard: drop updates not strictly newer than the stored
        // row — late arrivals and replays must never move a key backwards.
        // Equal-orderCol ties use the same digest tie-break as in-batch
        // (computed over the batch's column order on BOTH sides), so the
        // final state is the global min-digest row among the max-orderCol
        // rows, independent of how a tie was split across batches.
        val baseOrd = base.select(
          (keyCols.map(col) ++ Seq(col(orderCol).as("__base_ord"),
            digest.as("__base_dig"))): _*)
        val fresh = latest.withColumn("__dig", digest)
          .join(baseOrd, keyCols, "left")
          .where(col("__base_ord").isNull || col(orderCol) > col("__base_ord") ||
            (col(orderCol) === col("__base_ord") && col("__dig") < col("__base_dig")))
          .drop("__base_ord", "__base_dig", "__dig")
        // materialize BEFORE writing: Spark refuses to overwrite a path
        // that the lazy merge plan still reads (and would otherwise delete
        // the inputs out from under itself). This makes the parquet
        // warehouse copy-on-write per batch — inherent to plain parquet;
        // a table format with transactional MERGE (Delta/Iceberg) replaces
        // the rewrite with a metadata commit and is the drop-in upgrade.
        // MEMORY_AND_DISK: a batch whose merged table exceeds executor
        // memory must spill, not OOM the stream
        val merged = Merge.upsert(base, fresh, keyCols)
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        wh.write(name, merged)
      }
      .start()
    q.awaitTermination()
  }
}
