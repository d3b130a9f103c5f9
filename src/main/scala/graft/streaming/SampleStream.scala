package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import graft.operators.Sampling

/** Streaming weighted sampling — the operational twin of
  * [[graft.operators.Sampling.weightedSample]]: maintain the A-ES top-n
  * over an UNBOUNDED arrival stream, so a curation pipeline can hold "the
  * best n documents so far by quality weight" while data lands, without
  * ever re-scanning history.
  *
  * Exactness: the A-ES selection key `ln(u)/w` is a PURE ROW FUNCTION
  * (md5-uniform u), so the top-n over any batch grouping equals the top-n
  * over the union — each micro-batch folds its rows into the stored
  * candidate set and re-takes the top-n. The final state is byte-equal to
  * the batch `weightedSample` over all arrived rows (spec-asserted).
  *
  * Replay safety: foreachBatch is at-least-once. State generations write
  * to per-batch subdirectories (`batch_<id>`, mode=overwrite) and each
  * batch reads the LATEST EARLIER generation — a replayed batch re-reads
  * the same predecessor and rewrites the same directory; the fold is
  * idempotent because re-adding rows with identical keys and then
  * deduplicating by id changes nothing.
  *
  * Per-batch cost: O(batch + n) — key the batch (a projection), union
  * with the ≤n-row state, dedup by id, take n (TakeOrderedAndProject, no
  * global sort). The corpus never re-scans.
  */
object SampleStream {

  private def stateSchema(idCol: String, weightCol: String): StructType =
    new StructType()
      .add(idCol, LongType).add(weightCol, DoubleType).add("__es_key", DoubleType)

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest state generation strictly BEFORE `batchId` (replay-correct:
    * a retried batch must fold from its original predecessor, not from
    * its own partial output).
    */
  private def latestStateDir(spark: org.apache.spark.sql.SparkSession,
                             statePath: String, batchId: Long): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val f = fs(spark, statePath)
    if (!f.exists(root)) None
    else f.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_") => n.stripPrefix("batch_").toLong }
      .filter(_ < batchId)
      .sorted.lastOption
      .map(id => s"$statePath/batch_$id")
  }

  /** Run an AvailableNow pass over `newRows` (a streaming DataFrame
    * carrying at least idCol + weightCol), folding each micro-batch into
    * the stored top-`n` at `statePath`. Read the current sample with
    * [[currentSample]]. Rows with non-positive weights are excluded
    * (A-ES requires positive weights, as in the batch operator).
    */
  def weightedSampleAvailableNow(newRows: DataFrame, statePath: String,
                                 idCol: String, weightCol: String, n: Int,
                                 checkpointDir: Option[String] = None): Unit = {
    require(n >= 1, s"n must be >= 1, got $n")
    val q = newRows.writeStream
      .trigger(Trigger.AvailableNow())
      // durable default keyed to the state — a temp checkpoint would
      // restart batch ids and overwrite batch_0 beside older segments
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$statePath/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val keyed = batch
          .where(col(weightCol).cast("double") > 0)
          .select(col(idCol).cast("long").as(idCol),
            col(weightCol).cast("double").as(weightCol),
            Sampling.esKey(col(idCol), col(weightCol)).as("__es_key"))
        val state = latestStateDir(session, statePath, batchId) match {
          case Some(dir) => session.read.schema(stateSchema(idCol, weightCol)).parquet(dir)
          case None => session.createDataFrame(
            session.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            stateSchema(idCol, weightCol))
        }
        // duplicate ids across state ∪ batch (a re-arrival, possibly with
        // a CHANGED weight) must resolve deterministically or the stored
        // sample diverges from the batch operator's: keep the max
        // (__es_key, weight) struct per id — a total order, unlike
        // dropDuplicates, which keeps an arbitrary row
        state.unionByName(keyed)
          .groupBy(col(idCol))
          .agg(max(struct(col("__es_key"), col(weightCol))).as("__s"))
          .select(col(idCol), col(s"__s.$weightCol").as(weightCol),
            col("__s.__es_key").as("__es_key"))
          .orderBy(col("__es_key").desc, col(idCol))
          .limit(n)
          .select(keyed.columns.map(col).toIndexedSeq: _*)
          .write.mode("overwrite").parquet(s"$statePath/batch_$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** The current top-n: the latest stored generation. */
  def currentSample(spark: org.apache.spark.sql.SparkSession, statePath: String,
                    idCol: String, weightCol: String): DataFrame =
    latestStateDir(spark, statePath, Long.MaxValue) match {
      case Some(dir) => spark.read.schema(stateSchema(idCol, weightCol)).parquet(dir)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        stateSchema(idCol, weightCol))
    }
}
