package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SampleStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed A-ES top-n equals the batch weightedSample over all arrivals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    val streamDir = java.nio.file.Files.createTempDirectory("sample-stream").toString
    // three micro-batches by doc_id range, one parquet file each
    Seq(0L -> 170L, 170L -> 340L, 340L -> 10000L).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"sb$i").toString + "/out"
        docs.where(col("doc_id") >= lo && col("doc_id") < hi)
          .coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val statePath = java.nio.file.Files.createTempDirectory("sample-state").toString + "/state"
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    SampleStream.weightedSampleAvailableNow(stream, statePath, "doc_id", "n_chars", n = 50)

    val streamed = SampleStream.currentSample(spark, statePath, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val batch = Sampling.weightedSample(docs, "doc_id", "n_chars", 50)
      .select(col("doc_id"), col("__es_key"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed.size === 50)
    assert(streamed === batch,
      "cross-batch streamed top-n must equal the batch A-ES draw exactly")
    // three generations exist — one per micro-batch — plus the durable
    // checkpoint (underscore-prefixed, never parsed as a generation)
    val entries = new java.io.File(statePath).listFiles().map(_.getName).toSet
    assert(entries.contains("_checkpoint"))
    assert(entries.filterNot(_.startsWith("_")) === Set("batch_0", "batch_1", "batch_2"))
  }

  test("replaying a batch against its predecessor state is idempotent") {
    val rows = Seq((1L, 10.0), (2L, 20.0), (3L, 5.0), (4L, 40.0)).toDF("id", "w")
    val statePath = java.nio.file.Files.createTempDirectory("sample-replay").toString + "/state"
    // simulate generation 0, then fold the SAME batch twice as generation 1
    def fold(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val keyed = batch.where(col("w") > 0)
        .select(col("id").cast("long").as("id"), col("w").cast("double").as("w"),
          Sampling.esKey(col("id"), col("w")).as("__es_key"))
      val prior =
        try spark.read.parquet(s"$statePath/batch_${batchId - 1}")
        catch { case _: Exception => keyed.limit(0) }
      prior.unionByName(keyed).dropDuplicates("id")
        .orderBy(col("__es_key").desc, col("id")).limit(3)
        .write.mode("overwrite").parquet(s"$statePath/batch_$batchId")
    }
    fold(rows.limit(2), 0)
    fold(rows, 1)
    val first = spark.read.parquet(s"$statePath/batch_1")
      .collect().map(_.toString).sorted.toSeq
    fold(rows, 1) // replay
    val second = spark.read.parquet(s"$statePath/batch_1")
      .collect().map(_.toString).sorted.toSeq
    assert(first === second, "replay must rewrite identical state")
  }
}
