package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Index

/** Streaming inverted-index maintenance — the operational twin of the
  * q107 batch merge, shaped like an LSM tree rather than a fold:
  *
  *   - every micro-batch of new documents is tokenized ONCE and written
  *     as its own full-fidelity PARTIAL index segment
  *     (`statePath/batch_<id>`) — append-only, O(batch tokens), the
  *     corpus is never re-touched;
  *   - the queryable index is merge-on-read:
  *     [[currentIndex]] = ONE term-keyed aggregation over all segments
  *     ([[graft.operators.Index.mergePartials]]);
  *   - [[compact]] folds the accumulated segments back into one seed
  *     segment when read amplification grows — the LSM compaction,
  *     run at whatever cadence the operator chooses.
  *
  * A fold-style stream (state := mergeIndex(state, batch)) would rewrite
  * the ENTIRE index every batch — a 100-TB index rewritten daily for a
  * 0.1% increment. Segments + merge-on-read make the write path
  * increment-sized and defer the merge cost to reads that need it, which
  * is how every production indexer (Lucene included) handles exactly
  * this trade.
  *
  * Replay safety follows [[DedupStream]]: foreachBatch is at-least-once,
  * so each segment lands in its own `batch_<id>` subdirectory with
  * mode=overwrite — a retried batch rewrites identical content (the
  * partial index is a pure function of the batch), and the recursive
  * union read stays exact.
  */
object IndexStream {

  /** Seed the segment store from an existing corpus: its full-fidelity
    * index becomes the first segment. In a real warehouse this is the
    * already-stored index (the q107 "base").
    */
  def seedState(corpus: DataFrame, statePath: String,
                textCol: String, idCol: String): Unit =
    Index.invertedIndex(corpus, textCol, idCol)
      .write.mode("overwrite").parquet(s"$statePath/seed")

  /** Run an AvailableNow indexing pass over `newDocs` (a streaming
    * DataFrame carrying idCol + textCol): each micro-batch writes its
    * own partial-index segment. Document ids must be NEW relative to all
    * prior segments (the incremental-load contract, as in [[Index.mergeIndex]]).
    */
  def indexAvailableNow(newDocs: DataFrame, statePath: String,
                        textCol: String, idCol: String,
                        checkpointDir: Option[String] = None): Unit = {
    val spark0 = newDocs.sparkSession
    val seedPath = new org.apache.hadoop.fs.Path(s"$statePath/seed")
    require(seedPath.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(seedPath),
      s"index state at $statePath is not seeded — run IndexStream.seedState first")
    val q = newDocs.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default KEYED TO THE STATE: a fresh temp checkpoint per
      // invocation would restart batch ids at 0 and overwrite batch_0
      // with a different micro-batch while older segments persist —
      // breaking the disjoint-segments contract (underscore prefix keeps
      // it out of the recursive segment reads)
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Index.invertedIndex(batch, textCol, idCol)
          .write.mode("overwrite").parquet(s"$statePath/batch_$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The queryable index: merge-on-read over every segment. Output
    * `minDf`/`maxPostings` apply here (segments are always stored at
    * full fidelity — a truncated segment could not merge exactly).
    */
  def currentIndex(spark: SparkSession, statePath: String,
                   minDf: Int = 1, maxPostings: Int = Int.MaxValue): DataFrame =
    Index.mergePartials(
      spark.read.option("recursiveFileLookup", "true").parquet(statePath),
      minDf, maxPostings)

  /** LSM compaction: fold all segments into a fresh single-segment store
    * under `compactedPath` (full fidelity, ready to seed further
    * appends). Kept separate from the stream so the operator controls
    * the cadence; reading and compacting are the same aggregation.
    */
  def compact(spark: SparkSession, statePath: String, compactedPath: String): Unit =
    currentIndex(spark, statePath)
      .write.mode("overwrite").parquet(s"$compactedPath/seed")
}
