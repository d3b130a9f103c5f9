package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{Dbscan, Dedup}

/** Streaming DBSCAN maintenance — the operational twin of the q193
  * stored-index incremental DBSCAN, completing the streaming-twin family
  * (every other incremental family — dedup q72, index q107, ER q146,
  * media q157, substring-strip q188, WordPiece vocab q197 — already has
  * one). Same LSM shape as [[AnnIndexStream]]:
  *
  *   - [[seedState]] stores the base corpus's sign-plane bucket index
  *     ([[Dedup.signPlaneIndex]]) as `index/seed` and its neighbor-pair
  *     edges as `edges/seed`;
  *   - every micro-batch of new vectors generates ONLY its incremental
  *     pairs ([[Dedup.embeddingNearDupsDetIncrement]] probing the union
  *     of all PRIOR index segments — stored × stored is never recomputed,
  *     O(increment) like q193) and lands as its own `edges/batch_<id>` +
  *     `index/batch_<id>` segments (append-only);
  *   - the servable clustering is merge-on-read: [[clusters]] runs
  *     [[Dbscan.fromPairs]] over the edge-segment union — roles may
  *     legally change for ANY point (a new neighbor can upgrade an old
  *     noise point to core), which is why the report always covers the
  *     full corpus while ingestion stays O(increment);
  *   - [[compact]] folds segments into a fresh seed when file-count read
  *     amplification grows.
  *
  * Replay safety (the [[DedupStream]] doctrine, with one twist): each
  * batch's segments must be a PURE function of (batch, segments with
  * SMALLER batch id) — so [[priorIndex]] filters the index listing to
  * `seed` + `batch_<k>` with k < the current batch id. Without the
  * filter, an at-least-once retry of batch N would see batch N's own
  * index segment from the failed attempt and emit its inc×inc pairs
  * twice (once via the inc×inc orientation, once via the probe against
  * "stored" N). With it, a retried batch rewrites byte-identical content
  * with mode=overwrite.
  *
  * Exactness (the q193 theorem restated over segments): every unordered
  * near-dup pair materializes exactly once — seed×seed in the seed
  * segment; x∈batch j, y∈batch k (j < k) in batch k's segment (y probes
  * the prior index, which contains j); both-in-batch-k pairs once via
  * the probe-id < build-id orientation. The edge union therefore equals
  * [[Dedup.embeddingNearDupsDet]] over the full corpus, and
  * [[Dbscan.fromPairs]] on equal inputs is equal output — streamed ==
  * one-shot recompute EXACTLY, asserted by the spec on a 3-batch stream.
  */
object DbscanStream {

  /** Store the base corpus's bucket index + pair edges as the seed. */
  def seedState(corpus: DataFrame, statePath: String, vecCol: String,
                idCol: String, threshold: Double, planes: Int, dim: Int): Unit = {
    Dedup.signPlaneIndex(corpus, vecCol, idCol, planes, dim)
      .write.mode("overwrite").parquet(s"$statePath/index/seed")
    Dedup.embeddingNearDupsDet(corpus, vecCol, idCol, threshold, planes, dim)
      .select(col("id_a"), col("id_b"))
      .write.mode("overwrite").parquet(s"$statePath/edges/seed")
  }

  /** The index segments a batch is allowed to see: `seed` plus every
    * `batch_<k>` with k < `batchId` — NOT its own possibly-half-written
    * segment from a failed prior attempt (replay purity, scaladoc above).
    */
  private[streaming] def priorIndex(spark: SparkSession, statePath: String,
                                    batchId: Long): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$statePath/index")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = fs.listStatus(dir).map(_.getPath).filter { p =>
      p.getName == "seed" ||
        (p.getName.startsWith("batch_") &&
          scala.util.Try(p.getName.stripPrefix("batch_").toLong).toOption
            .exists(_ < batchId))
    }.map(_.toString)
    require(keep.nonEmpty,
      s"DBSCAN state at $statePath is not seeded — run DbscanStream.seedState first")
    spark.read.parquet(keep.toIndexedSeq: _*)
  }

  /** Run an AvailableNow ingestion pass over `newVecs` (a streaming
    * DataFrame carrying idCol + vecCol): each micro-batch writes its own
    * edge + index segments against the prior segments only. Vector ids
    * must be NEW relative to all prior segments (the incremental-load
    * contract). Durable checkpoint under the state it protects, exactly
    * as [[AnnIndexStream.indexAvailableNow]] documents.
    */
  def ingestAvailableNow(newVecs: DataFrame, statePath: String, vecCol: String,
                         idCol: String, threshold: Double, planes: Int, dim: Int,
                         checkpointDir: Option[String] = None): Unit = {
    val q = newVecs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stored = priorIndex(spark, statePath, batchId)
        Dedup.embeddingNearDupsDetIncrement(stored, batch, vecCol, idCol,
            threshold, planes, dim)
          .select(col("id_a"), col("id_b"))
          .write.mode("overwrite").parquet(s"$statePath/edges/batch_$batchId")
        Dedup.signPlaneIndex(batch, vecCol, idCol, planes, dim)
          .write.mode("overwrite").parquet(s"$statePath/index/batch_$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The full edge set: every segment, one recursive read. */
  def currentEdges(spark: SparkSession, statePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$statePath/edges")

  /** Every ingested point (id column `vid`), read off the index segments
    * — the point census DBSCAN needs so isolated points report as noise.
    */
  def currentPoints(spark: SparkSession, statePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$statePath/index")
      .select(col("__id").as("vid"))

  /** The servable clustering: [[Dbscan.fromPairs]] over the merged state. */
  def clusters(spark: SparkSession, statePath: String, minPts: Int): DataFrame =
    Dbscan.fromPairs(currentPoints(spark, statePath), "vid",
      currentEdges(spark, statePath), "id_a", "id_b", minPts)

  /** LSM compaction: fold all segments into a fresh seed under
    * `compactedPath` (edges and index both; clustering output is
    * unchanged because the unions are).
    */
  def compact(spark: SparkSession, statePath: String, compactedPath: String): Unit = {
    currentEdges(spark, statePath)
      .write.mode("overwrite").parquet(s"$compactedPath/edges/seed")
    spark.read.option("recursiveFileLookup", "true").parquet(s"$statePath/index")
      .write.mode("overwrite").parquet(s"$compactedPath/index/seed")
  }
}
