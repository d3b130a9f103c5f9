package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Bloom

/** Streaming Bloom ingest filter — the operational twin of the q139/q140
  * batch membership check ([[graft.operators.Bloom]]): the accumulated
  * corpus's Bloom bit table is the stored state, and every arriving
  * micro-batch of candidate keys (crawl URLs, content digests) is probed
  * against it BEFORE ingestion — keys the filter has provably never seen
  * (member = false ⇒ definitely new, the no-false-negative guarantee
  * inverted) flow through as the batch's genuinely-new set; bloom-flagged
  * keys are held back (a false-positive-rate-sized loss, or the input to
  * an exact confirm join in a full pipeline — q140's composition).
  *
  * This is the crawl-frontier / "already ingested?" pattern at 100 TB:
  * per-batch cost is O(batch + bit table) — the corpus key set is never
  * rescanned, the state is bounded by m bits regardless of corpus size,
  * and the probe side joins the BROADCAST bit table.
  *
  * State follows the [[IndexStream]]/[[DriftStream]] LSM principle:
  * each batch appends its own positions as an immutable
  * `bits/batch_<id>` segment (mode=overwrite ⇒ an at-least-once retry
  * rewrites identical content), merge-on-read is one distinct. Fed the
  * same rows, the final merged bit table is BYTE-IDENTICAL to a one-shot
  * `Bloom.build` over seed ∪ all batches (spec-asserted).
  */
object BloomStream {

  /** Store the seed corpus's bit table under `statePath/bits/seed`.
    * Run once; the per-batch filter refuses to start without it.
    */
  def seed(keys: DataFrame, statePath: String, keyCol: String,
           k: Int = 3, mBits: Int = 8192): Unit =
    Bloom.build(keys, keyCol, k, mBits)
      .write.mode("overwrite").parquet(s"$statePath/bits/seed")

  /** Accumulated bit table: merge-on-read distinct over all segments. */
  def bits(spark: org.apache.spark.sql.SparkSession, statePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$statePath/bits").distinct()

  /** Bit state as of (strictly before) `batchId`: seed plus batch_<i>
    * segments with i < batchId ONLY. The in-batch read MUST use this, not
    * [[bits]]: under at-least-once replay a failed batch may have already
    * written its own `bits/batch_<id>` segment before the checkpoint
    * committed, and a whole-directory read would then see the batch's own
    * bits — every batch key would probe as member and the retry would
    * overwrite `newPath/batch_<id>` with an EMPTY set, silently losing
    * that batch's output. Excluding the current-and-later segments makes
    * the retry read exactly the state the first attempt read, so the
    * rewrite is byte-identical (spec: BloomStreamSpec retry case).
    */
  def bitsBefore(spark: org.apache.spark.sql.SparkSession, statePath: String,
                 batchId: Long): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$statePath/bits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(dir).map(_.getPath).filter { p =>
      val n = p.getName
      n == "seed" || (n.startsWith("batch_") &&
        scala.util.Try(n.stripPrefix("batch_").toLong).toOption.exists(_ < batchId))
    }.map(_.toString)
    spark.read.parquet(segs.toIndexedSeq: _*).distinct()
  }

  /** Run an AvailableNow filtering pass over `newKeys` (a streaming
    * DataFrame carrying `keyCol`): per batch, write the batch's
    * never-seen keys under `newPath/batch_<id>` and append the batch's
    * own positions as the next bit segment — so a key emitted in batch N
    * is state by batch N+1 and re-deliveries across batches are dropped
    * for the lifetime of the filter (not just a watermark horizon — the
    * m-bounded state is the trade against [[DedupStream]]'s exact
    * horizon-bounded one).
    */
  def filterNewAvailableNow(newKeys: DataFrame, statePath: String, newPath: String,
                            keyCol: String, k: Int = 3, mBits: Int = 8192,
                            checkpointDir: Option[String] = None): Unit = {
    val spark0 = newKeys.sparkSession
    val seedP = new org.apache.hadoop.fs.Path(s"$statePath/bits/seed")
    require(seedP.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(seedP),
      s"bloom state at $statePath is not seeded — run BloomStream.seed first")
    val q = newKeys.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val state = bitsBefore(spark, statePath, batchId)
        val fresh = Bloom.probe(state, batch.select(col(keyCol)), keyCol, k, mBits)
          .where(!col("member"))
          .select(col(keyCol))
        // 1. the genuinely-new keys (replay-safe overwrite)
        fresh.write.mode("overwrite").parquet(s"$newPath/batch_$batchId")
        // 2. the batch's positions as the next immutable segment — built
        // from the WHOLE batch, so even held-back (FP) keys set their
        // bits and the segment is deterministic under retry
        Bloom.build(batch.select(col(keyCol)), keyCol, k, mBits)
          .write.mode("overwrite").parquet(s"$statePath/bits/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
