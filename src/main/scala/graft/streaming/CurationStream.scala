package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dedup, TextAnalysis}

/** Streaming incremental CURATION — the operational twin of the q84 batch
  * job (`DocQueries.q84IncrementalCuration`): every micro-batch of new
  * documents is curated against ALL previously accepted state (the
  * corpus's LSH band index, content digests, and texts), receives a
  * (doc_id, keep, reason) verdict with q83/q84's exact precedence
  * (exact_dup > near_dup > too_short > lang_filtered > keep), and then
  * appends its own bands/digests/texts to the state — so day N+1 is
  * curated against days 1..N without ever re-signing them.
  *
  * Policy is ARRIVAL-PRIORITY, exactly q84's corpus-priority rule
  * generalized to a stream: a document drops when it exact- or near-dups
  * anything already in the state, or a LOWER-id document of its own batch.
  * Fed the same documents in id order, the union of all batch verdicts is
  * byte-identical to the one-shot q84 batch on the same corpus split
  * (spec-asserted, 3 batches) — the stream and the batch job are the same
  * program at different cadences.
  *
  * Per-batch cost is O(batch + candidates), never O(corpus): the batch is
  * signed ONCE (localCheckpoint reused by the pair join, the digest
  * probe, and the state append); the corpus participates through one
  * (band, band_key) equi-join against its stored index, one digest
  * equi-join, and scan-only semi-joins — the [[DedupStream]] shape, which
  * INCPROOF_r3 measured at 87s vs 405s naive for exactly this reason.
  * Jaccard verification is content-memoized
  * ([[graft.operators.Dedup.jaccardOnPairsByContent]]) and fed ONLY the
  * candidate pairs' member documents, so its digest/representative
  * machinery is candidate-bounded too.
  *
  * Replay safety follows [[DedupStream]]: foreachBatch is at-least-once,
  * so every write lands in its own `batch_<id>` subdirectory with
  * mode=overwrite — a retried batch rewrites identical content and the
  * recursive union read stays exact.
  */
object CurationStream {

  /** Seed the curation state under `statePath` from the existing corpus:
    * band index, content digests, and texts (each under a `seed`
    * subdirectory, the bootstrap the per-batch appends extend). Run once
    * before the first [[curateAvailableNow]] pass; in a real warehouse
    * these three tables already exist as the corpus's stored dedup state.
    */
  def seedState(corpus: DataFrame, statePath: String,
                textCol: String, idCol: String): Unit = {
    val c = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    Dedup.minhashBandIndexMd5(c, "text", "doc_id")
      .select("__id", "band", "band_key")
      .write.mode("overwrite").parquet(s"$statePath/bands/seed")
    c.select(col("doc_id"), md5(lower(trim(col("text")))).as("__dig"))
      .write.mode("overwrite").parquet(s"$statePath/digests/seed")
    c.write.mode("overwrite").parquet(s"$statePath/docs/seed")
  }

  /** Run an AvailableNow curation pass over `newDocs` (a streaming
    * DataFrame carrying idCol, textCol, langCol), writing per-batch
    * (doc_id, keep, reason) verdicts under `verdictPath/batch_<id>` and
    * growing the state under `statePath`. `allowedLangs` mirrors the
    * q83/q84 allowlist; `minTokens` the Gopher-style length floor.
    */
  def curateAvailableNow(newDocs: DataFrame, statePath: String, verdictPath: String,
                         textCol: String, idCol: String, langCol: String,
                         allowedLangs: Seq[String] = Seq("en", "es", "de", "fr"),
                         minTokens: Int = 20,
                         checkpointDir: Option[String] = None): Unit = {
    val spark0 = newDocs.sparkSession
    val seedPath = new org.apache.hadoop.fs.Path(s"$statePath/bands/seed")
    require(seedPath.getFileSystem(spark0.sparkContext.hadoopConfiguration).exists(seedPath),
      s"curation state at $statePath is not seeded — run CurationStream.seedState first")
    val q = newDocs.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        // canonical internal names; checkpoint once — the batch feeds the
        // band signing, the digest probe, the verdict chain, and the
        // state append
        val b = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"),
            col(langCol).as("lang"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)

        def readState(sub: String) = session.read
          .option("recursiveFileLookup", "true").parquet(s"$statePath/$sub")

        // --- near-dups: batch bands vs stored index + in-batch pairs ---
        val newBands = Dedup.minhashBandIndexMd5(b, "text", "doc_id")
          .select("__id", "band", "band_key")
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
        val cand = Dedup.incrementalCandidatesFromBands(newBands, readState("bands"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
        val storedDocs = readState("docs")
        // Jaccard verification must stay O(candidates), not O(corpus):
        // jaccardOnPairsByContent builds its digest/representative tables
        // over whatever docs it is given, so feed it ONLY the candidate
        // pairs' members (semi-join prune). Restricting the doc set can
        // change WHICH id represents a digest but never the jaccard value
        // (representatives share identical content), so verdicts are
        // unchanged — the spec's byte-identity to batch q84 pins that.
        val pairIds = cand.select(col("id_a").as("doc_id"))
          .unionByName(cand.select(col("id_b").as("doc_id"))).distinct()
        val pairDocs = storedDocs.select("doc_id", "text")
          .unionByName(b.select("doc_id", "text"))
          .join(pairIds, Seq("doc_id"), "left_semi")
        val nearDups = Dedup.jaccardOnPairsByContent(cand, pairDocs, "text", "doc_id", k = 5)
          .where(col("jaccard") >= 0.8)
          .select(col("id_a"), col("id_b"))
        // a batch doc drops when the partner is already in the state, or
        // is a lower-id doc of the same batch (q84's rule, stream form)
        val storedIds = storedDocs.select(col("doc_id").as("other"), lit(1L).as("__stored"))
        val dropNear = nearDups
          .select(explode(array(
            struct(col("id_a").as("me"), col("id_b").as("other")),
            struct(col("id_b").as("me"), col("id_a").as("other")))).as("p"))
          .select(col("p.me").as("me"), col("p.other").as("other"))
          .join(b.select(col("doc_id").as("me")), Seq("me"), "left_semi")
          .join(storedIds, Seq("other"), "left")
          .where(col("__stored").isNotNull || col("other") < col("me"))
          .select(col("me").as("doc_id")).distinct()
          .withColumn("__nd", lit(1L))

        // --- exact dups: digest probe against stored ∪ same batch ---
        val newDig = b.select(col("doc_id"), md5(lower(trim(col("text")))).as("__dig"))
        val otherDig = readState("digests")
          .select(col("doc_id").as("o_id"), col("__dig"), lit(1L).as("__stored"))
          .unionByName(newDig.select(col("doc_id").as("o_id"), col("__dig"),
            lit(0L).as("__stored")))
        val dropExact = newDig.join(otherDig, Seq("__dig"))
          .where(col("__stored") === 1L || col("o_id") < col("doc_id"))
          .select("doc_id").distinct()
          .withColumn("__ed", lit(1L))

        // --- verdict (q83/q84 precedence), then grow the state ---
        b.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
          .join(dropExact, Seq("doc_id"), "left")
          .join(dropNear, Seq("doc_id"), "left")
          .withColumn("reason",
            when(col("__ed").isNotNull, "exact_dup")
              .when(col("__nd").isNotNull, "near_dup")
              .when(col("n_tokens") < minTokens, "too_short")
              .when(!col("lang").isin(allowedLangs: _*), "lang_filtered")
              .otherwise("keep"))
          .select(col("doc_id"),
            (col("reason") === "keep").cast("long").as("keep"),
            col("reason"))
          .write.mode("overwrite").parquet(s"$verdictPath/batch_$batchId")
        newBands.write.mode("overwrite").parquet(s"$statePath/bands/batch_$batchId")
        newDig.write.mode("overwrite").parquet(s"$statePath/digests/batch_$batchId")
        b.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$statePath/docs/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
