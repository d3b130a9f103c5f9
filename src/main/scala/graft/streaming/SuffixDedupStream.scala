package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import graft.operators.SuffixDedup

/** Streaming keep-first substring-dedup strip: the streaming twin of
  * [[graft.operators.SuffixDedup.stripIncrement]]. Each micro-batch of
  * documents is stripped against the CURRENT stored gram-firsts state
  * (every minLen-token window that already occurred in an earlier batch
  * — or earlier in this batch — is removed), then the batch's own
  * gram-firsts are ADDED to the state, so every batch dedups against all
  * earlier ones.
  *
  * Exactness (the q188 theorem, batched): under the monotone-ingest
  * contract (batch N's ids sort before batch N+1's — the arrival-order
  * snapshot every incremental family here assumes), the stored per-gram
  * minimum at batch B IS the global first occurrence over batches <= B,
  * and occurrences in later batches carry larger ids and can never
  * displace it — so the union of the per-batch stripped outputs equals
  * [[SuffixDedup.stripAllButFirst]] over the whole corpus
  * (spec-asserted).
  *
  * State shape: an LSM of per-batch firsts segments (the
  * [[DedupStream]] / IndexStream pattern) — each batch APPENDS its own
  * [[SuffixDedup.gramFirsts]] table as a `batch_<id>` subdirectory and
  * the read side folds segments with one per-gram min aggregation
  * (associative, so segment count only affects the fold width, not
  * correctness). Compaction, when segments accumulate, is one
  * [[SuffixDedup.mergeFirsts]] pass — the same operator the batch form
  * uses.
  *
  * Replay safety: foreachBatch is AT-LEAST-ONCE; both sinks write each
  * batch into its own `batch_<id>` subdirectory with mode=overwrite, so
  * a replayed batch rewrites identical content and the union read stays
  * exact (the [[DedupStream]] contract). Per-batch cost: ONE shingle
  * pass over the batch ([[SuffixDedup.stripIncrementAndFirsts]] shares
  * the materialized gram table between the strip and the firsts write)
  * plus one gram equi-join against the folded state — O(increment),
  * never the corpus.
  */
object SuffixDedupStream {

  private val firstsSchema = new StructType()
    .add("gram", StringType).add("first_id", LongType).add("first_pos", IntegerType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run an AvailableNow pass over `newDocs` (a streaming DataFrame of
    * (idCol, textCol)), writing each batch's stripped documents under
    * `outPath/batch_<id>` and its gram-firsts segment under
    * `firstsPath/batch_<id>` (read either root with
    * `recursiveFileLookup`). A missing firsts root bootstraps empty,
    * through the Hadoop FileSystem API so object-store paths work too.
    */
  def stripAvailableNow(newDocs: DataFrame, firstsPath: String, outPath: String,
                        textCol: String, idCol: String, minLen: Int = 5,
                        checkpointDir: Option[String] = None): Unit = {
    val spark = newDocs.sparkSession
    val firstsRoot = new org.apache.hadoop.fs.Path(firstsPath)
    if (!fs(spark, firstsPath).exists(firstsRoot)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], firstsSchema)
        .write.mode("overwrite").parquet(s"$firstsPath/bootstrap")
    }
    val q = newDocs.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$firstsPath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        // fold the LSM segments to the per-gram global minimum — one
        // map-side-combinable aggregation over state rows, not corpus
        val stored = session.read.schema(firstsSchema)
          .option("recursiveFileLookup", "true").parquet(firstsPath)
          .groupBy(col("gram"))
          .agg(min(struct(col("first_id").as("i"), col("first_pos").as("p"))).as("__f"))
          .select(col("gram"), col("__f.i").as("first_id"), col("__f.p").as("first_pos"))
        val (stripped, incFirsts) =
          SuffixDedup.stripIncrementAndFirsts(stored, batch, textCol, idCol, minLen)
        // strip FIRST, segment write SECOND: the strip job re-reads the
        // firsts root lazily, and writing this batch's segment before the
        // strip executes would fold the batch's own firsts into "stored"
        stripped.write.mode("overwrite").parquet(s"$outPath/batch_$batchId")
        incFirsts
          .select(col("gram"), col("first_id").cast("long").as("first_id"),
            col("first_pos").cast("int").as("first_pos"))
          .write.mode("overwrite").parquet(s"$firstsPath/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
