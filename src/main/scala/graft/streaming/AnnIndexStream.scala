package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Similarity

/** Streaming IVF-index maintenance — the operational twin of the q175
  * stored/incremental ANN index, completing the streaming-twin family
  * (dedup/index/media/curation/SCD2/drift/bloom/entity-resolution all
  * have theirs). Same LSM shape as [[IndexStream]]:
  *
  *   - [[seedState]] stores the MODEL (the centroid table — the part
  *     that must never silently drift) and the base corpus's inverted
  *     lists as the seed segment;
  *   - every micro-batch of new vectors assigns against the STORED
  *     centroids — O(batch·centroids), never a re-cluster — and lands
  *     as its own `lists/batch_<id>` segment (append-only);
  *   - the servable index is merge-on-read: [[currentLists]] is a plain
  *     recursive union (list segments are disjoint by the new-ids
  *     contract; no aggregation is even needed, unlike BM25's postings);
  *   - [[serveTopK]] probes the merged lists through
  *     [[Similarity.ivfTopKFromIndex]];
  *   - [[compact]] folds segments into a fresh seed when file-count
  *     read amplification grows.
  *
  * Replay safety (the [[DedupStream]] doctrine): foreachBatch is
  * at-least-once; each segment is a PURE function of (batch, stored
  * centroids) written with mode=overwrite into its own batch directory,
  * so a retried batch rewrites identical content. Because assignment is
  * per-row independent given fixed centroids, the streamed index equals
  * the one-shot [[Similarity.ivfIndex]] over the full corpus EXACTLY —
  * the q175 theorem, asserted per batch count in the spec.
  */
object AnnIndexStream {

  /** Store the centroid model + the base corpus's lists as the seed. */
  def seedState(corpus: DataFrame, statePath: String,
                vecCol: String, idCol: String, numCentroids: Int): Unit = {
    val cents = Similarity.seedCentroids(corpus, vecCol, idCol, numCentroids)
    cents.write.mode("overwrite").parquet(s"$statePath/centroids")
    Similarity.ivfIndex(corpus, vecCol, idCol, cents)
      .write.mode("overwrite").parquet(s"$statePath/lists/seed")
  }

  /** Run an AvailableNow assignment pass over `newVecs` (a streaming
    * DataFrame carrying idCol + vecCol): each micro-batch writes its own
    * list segment against the stored centroids. Vector ids must be NEW
    * relative to all prior segments (the incremental-load contract).
    *
    * The checkpoint defaults to `statePath/_checkpoint` — DURABLE, keyed
    * to the state it protects. A fresh temp dir per invocation would
    * restart batch ids at 0 on every run, overwriting `lists/batch_0`
    * with a possibly different micro-batch composition while older
    * higher-numbered segments persist — duplicating ids across segments
    * and breaking the disjoint-lists merge-on-read contract. With the
    * durable checkpoint, at-least-once replay reuses the same offsets
    * and batch ids, so a retried batch rewrites identical content (the
    * replay-safety doctrine above).
    */
  def indexAvailableNow(newVecs: DataFrame, statePath: String,
                        vecCol: String, idCol: String,
                        checkpointDir: Option[String] = None): Unit = {
    val spark0 = newVecs.sparkSession
    val centPath = new org.apache.hadoop.fs.Path(s"$statePath/centroids")
    require(centPath.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(centPath),
      s"ANN index state at $statePath is not seeded — run AnnIndexStream.seedState first")
    val q = newVecs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cents = batch.sparkSession.read.parquet(s"$statePath/centroids")
        Similarity.ivfIndex(batch, vecCol, idCol, cents)
          .write.mode("overwrite").parquet(s"$statePath/lists/batch_$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The servable lists: every segment, one recursive read. */
  def currentLists(spark: SparkSession, statePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$statePath/lists")

  /** ANN serving straight off the segment store. */
  def serveTopK(spark: SparkSession, statePath: String, queries: DataFrame,
                vecCol: String, idCol: String, k: Int, numProbe: Int): DataFrame =
    Similarity.ivfTopKFromIndex(queries, vecCol, idCol,
      currentLists(spark, statePath),
      spark.read.parquet(s"$statePath/centroids"), k, numProbe)

  /** LSM compaction: fold all list segments into a fresh single-segment
    * store under `compactedPath`, carrying the centroid model over
    * unchanged (compaction must never retrain the model).
    */
  def compact(spark: SparkSession, statePath: String, compactedPath: String): Unit = {
    spark.read.parquet(s"$statePath/centroids")
      .write.mode("overwrite").parquet(s"$compactedPath/centroids")
    currentLists(spark, statePath)
      .write.mode("overwrite").parquet(s"$compactedPath/lists/seed")
  }
}
