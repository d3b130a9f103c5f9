package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{EntityResolution, FuzzyJoin}

/** Streaming incremental entity resolution — the operational twin of
  * q146's [[graft.operators.EntityResolution.resolveIncrement]], closing
  * the family: dedup ([[DedupStream]]), index ([[IndexStream]]) and media
  * ([[MediaHashStream]]) already had theirs. Each micro-batch of records
  * joins against the STORED deletion-variant index (never re-signing the
  * corpus), appends its own variants as the next LSM segment, and writes
  * the O(increment)-sized assignment DELTA (increment ids + members of
  * touched entities) as a latest-wins segment — so per-batch cost is
  * bounded by |batch| + |touched entities| and the corpus is never
  * rewritten.
  *
  * State layout under `statePath`:
  *   - `variants/seed`, `variants/batch_<id>` — immutable deletion-variant
  *     segments (merge-on-read is a plain union: variants are append-only);
  *   - `assign/seed`, `assign/batch_<id>` — assignment segments; a row's
  *     authoritative entity is its LATEST segment's value (merge-on-read:
  *     max-segment-wins per id), because a later batch may merge an
  *     existing record into a bigger entity. Production runs would
  *     periodically compact `assign/` (the [[graft.etl.ManifestWarehouse]]
  *     OPTIMIZE shape); the stream itself never needs to.
  *
  * Correctness: by q146's incremental==full theorem each batch's update
  * equals a full re-resolve over everything seen so far; by induction the
  * merged assignment after batch N equals ONE-SHOT
  * [[EntityResolution.assignEntities]] over seed ∪ batches 1..N whatever
  * the batch grouping (spec-asserted byte-identical labels).
  *
  * Replay safety (the [[BloomStream.bitsBefore]] doctrine): the in-batch
  * read lists segments EXPLICITLY and keeps only seed plus batch_<i> with
  * i < batchId — under an at-least-once retry whose own segments were
  * already written, the re-run reads exactly the state the first attempt
  * read and rewrites identical content (mode=overwrite per segment dir).
  *
  * Ids must be unique across the seed and all batches (the warehouse
  * contract resolveIncrement states).
  */
object EntityResolutionStream {

  /** Store the existing corpus's artifacts: its deletion-variant index
    * and its one-shot entity assignment. Run once; the per-batch resolver
    * refuses to start without it.
    */
  def seed(records: DataFrame, statePath: String, strCol: String, idCol: String,
           t: Int = 1): Unit = {
    val withLongId = records.withColumn("__lid", col(idCol).cast("long"))
    FuzzyJoin.deletionVariants(withLongId, strCol, "__lid", t)
      .write.mode("overwrite").parquet(s"$statePath/variants/seed")
    EntityResolution.assignEntities(records, strCol, idCol, t)
      .write.mode("overwrite").parquet(s"$statePath/assign/seed")
  }

  /** The merged assignment table (id, entity) over ALL segments —
    * latest-wins per id. */
  def assignments(spark: SparkSession, statePath: String): DataFrame =
    assignBefore(spark, statePath, Long.MaxValue)

  /** Segments under `dir` visible to batch `batchId`: seed (order −1)
    * plus batch_<i> with i < batchId, as (order, path). */
  private[streaming] def segmentsBefore(spark: SparkSession, dir: String,
                             batchId: Long): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath).flatMap { seg =>
      seg.getName match {
        case "seed" => Some((-1L, seg.toString))
        case n if n.startsWith("batch_") =>
          n.stripPrefix("batch_").toLongOption.filter(_ < batchId)
            .map(i => (i, seg.toString))
        case _ => None
      }
    }
  }

  /** Variant index as of batch `batchId` (union of earlier segments —
    * variants are append-only, no precedence needed). */
  private[streaming] def variantsBefore(spark: SparkSession, statePath: String,
                             batchId: Long): DataFrame = {
    val paths = segmentsBefore(spark, s"$statePath/variants", batchId).map(_._2)
    spark.read.parquet(paths: _*)
  }

  /** Assignment as of batch `batchId`: per id, the entity from the
    * HIGHEST-numbered segment containing it. */
  private[streaming] def assignBefore(spark: SparkSession, statePath: String,
                           batchId: Long): DataFrame = {
    val segs = segmentsBefore(spark, s"$statePath/assign", batchId)
    require(segs.nonEmpty, s"entity-resolution state at $statePath is not seeded")
    segs.map { case (ord, path) =>
        spark.read.parquet(path).select(col("id"), col("entity"), lit(ord).as("__seg"))
      }
      .reduce(_ unionByName _)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("__seg").desc)))
      .where(col("__rn") === 1)
      .select(col("id"), col("entity"))
  }

  /** Run an AvailableNow resolution pass over `newRecords` (a streaming
    * DataFrame carrying idCol + strCol): per batch, compute the
    * assignment delta against the stored state and append (delta, batch
    * variants) as the next segments.
    */
  def resolveAvailableNow(newRecords: DataFrame, statePath: String,
                          strCol: String, idCol: String, t: Int = 1,
                          checkpointDir: Option[String] = None): Unit = {
    val spark0 = newRecords.sparkSession
    val seedP = new org.apache.hadoop.fs.Path(s"$statePath/assign/seed")
    require(seedP.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(seedP),
      s"entity-resolution state at $statePath is not seeded — run EntityResolutionStream.seed first")
    val q = newRecords.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val assign = assignBefore(spark, statePath, batchId)
        val vars = variantsBefore(spark, statePath, batchId)
        // pin the id to long BEFORE the variant union so the batch's
        // __id type always matches the stored segments' schema
        val longIds = batch.withColumn(idCol, col(idCol).cast("long"))
        EntityResolution.resolveIncrementDelta(assign, vars, longIds, strCol, idCol, t)
          .write.mode("overwrite").parquet(s"$statePath/assign/batch_$batchId")
        val withLongId = batch.withColumn("__lid", col(idCol).cast("long"))
        FuzzyJoin.deletionVariants(withLongId, strCol, "__lid", t)
          .write.mode("overwrite").parquet(s"$statePath/variants/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
