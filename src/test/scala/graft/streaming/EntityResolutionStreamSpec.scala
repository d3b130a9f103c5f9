package graft.streaming

import graft.SparkTestBase
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

class EntityResolutionStreamSpec extends SparkTestBase {
  import spark.implicits._

  // seed + 3 micro-batches with every linkage topology the theorem must
  // cover: within-batch pairs, batch→seed pairs, a batch record BRIDGING
  // two previously-separate entities, and singletons
  private val seedRows = Seq(
    1L -> "acme corp", 2L -> "acme corp.", // seed entity {1,2}
    3L -> "globex", // singleton until batch 2 touches it
    4L -> "initech")
  private val batches = Seq(
    Seq(10L -> "acme corpx", 11L -> "umbrella"), // 10 joins {1,2}; 11 singleton
    Seq(20L -> "globexx", 21L -> "globexy"), // within-batch pair + seed join
    Seq(30L -> "initechh", 31L -> "umbrellaa")) // 31 bridges 11 across batches

  test("3-batch stream equals one-shot assignEntities, byte-identical labels") {
    val statePath = java.nio.file.Files.createTempDirectory("er-state").toString + "/st"
    val streamDir = java.nio.file.Files.createTempDirectory("er-docs")
    EntityResolutionStream.seed(
      seedRows.toDF("rec_id", "name"), statePath, "name", "rec_id", t = 1)
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"erb$i").toString + "/out"
      rows.toDF("rec_id", "name").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = seedRows.toDF("rec_id", "name").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    EntityResolutionStream.resolveAvailableNow(stream, statePath, "name", "rec_id", t = 1)

    val streamed = EntityResolutionStream.assignments(spark, statePath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = EntityResolution.assignEntities(
        (seedRows ++ batches.flatten).toDF("rec_id", "name"), "name", "rec_id", t = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === full)
    // the topologies actually exercised what they claim
    assert(streamed(10L) === streamed(1L), "batch record joins seed entity")
    assert(streamed(20L) === streamed(3L) && streamed(21L) === streamed(3L),
      "within-batch pair + seed join")
    assert(streamed(31L) === streamed(11L), "cross-batch pair via stored variants")
    assert(streamed(4L) === streamed(30L))
  }

  test("a replayed batch with its segments pre-written rewrites identical content") {
    // simulate the at-least-once retry: run the stream once, then re-run
    // batch 1's body with its own segments already on disk — the
    // segmentsBefore read must exclude them, so the delta is unchanged
    val statePath = java.nio.file.Files.createTempDirectory("er-state2").toString + "/st"
    EntityResolutionStream.seed(
      seedRows.toDF("rec_id", "name"), statePath, "name", "rec_id", t = 1)
    val b0 = batches(0).toDF("rec_id", "name")
    val b1 = batches(1).toDF("rec_id", "name")
    def runBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      // the foreachBatch body, inlined (same package → same helpers)
      val assign = EntityResolutionStream.assignBefore(spark, statePath, id)
      val vars = EntityResolutionStream.variantsBefore(spark, statePath, id)
      EntityResolution.resolveIncrementDelta(assign, vars, df, "name", "rec_id", 1)
        .write.mode("overwrite").parquet(s"$statePath/assign/batch_$id")
      graft.operators.FuzzyJoin.deletionVariants(
          df.withColumn("__lid", col("rec_id").cast("long")), "name", "__lid", 1)
        .write.mode("overwrite").parquet(s"$statePath/variants/batch_$id")
    }
    runBatch(b0, 0L)
    runBatch(b1, 1L)
    val firstDelta = spark.read.parquet(s"$statePath/assign/batch_1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(firstDelta.nonEmpty)
    runBatch(b1, 1L) // retry: batch 1's own segments are already on disk
    val retryDelta = spark.read.parquet(s"$statePath/assign/batch_1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(retryDelta === firstDelta)
  }
}
