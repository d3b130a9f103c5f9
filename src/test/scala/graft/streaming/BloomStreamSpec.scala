package graft.streaming

import graft.SparkTestBase
import graft.operators.Bloom
import org.apache.spark.sql.functions._

class BloomStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatches(batches: Seq[Seq[String]]): java.nio.file.Path = {
    val streamDir = java.nio.file.Files.createTempDirectory("bloom-keys")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"bb$i").toString + "/out"
      rows.toDF("k").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    streamDir
  }

  test("streamed state equals the one-shot build; seen keys are never re-emitted") {
    val seedKeys = (1 to 100).map(i => s"seed_$i")
    val batches = Seq(
      (1 to 50).map(i => s"b0_$i"),
      // batch 1 re-delivers half of batch 0 plus fresh keys
      (1 to 25).map(i => s"b0_$i") ++ (1 to 30).map(i => s"b1_$i"),
      // batch 2 re-delivers seed keys plus fresh keys
      (1 to 40).map(i => s"seed_$i") ++ (1 to 20).map(i => s"b2_$i"))
    val streamDir = writeBatches(batches)
    val statePath = java.nio.file.Files.createTempDirectory("bloom-state").toString + "/st"
    val newPath = java.nio.file.Files.createTempDirectory("bloom-new").toString + "/new"

    BloomStream.seed(seedKeys.toDF("k"), statePath, "k", k = 3, mBits = 32768)
    val schema = batches.head.toDF("k").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    BloomStream.filterNewAvailableNow(stream, statePath, newPath, "k",
      k = 3, mBits = 32768)

    // final merged state == one-shot build over seed + every batch
    val streamed = BloomStream.bits(spark, statePath)
      .collect().map(_.getLong(0)).sorted.toSeq
    val oneShot = Bloom.build((seedKeys ++ batches.flatten).toDF("k"), "k",
        k = 3, mBits = 32768)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed === oneShot)

    // no key is emitted twice, and nothing from the seed or an earlier
    // batch leaks through (zero false negatives across segments)
    val emitted = spark.read.option("recursiveFileLookup", "true").parquet(newPath)
      .collect().map(_.getString(0)).toSeq
    assert(emitted.distinct.size === emitted.size, "a key was emitted twice")
    assert(!emitted.exists(_.startsWith("seed_")), "a seeded key leaked through")
    assert(emitted.count(_.startsWith("b0_")) <= 50, "a re-delivered b0 key leaked")

    // at m=32768 / ~265 keys the FP rate is ~1e-5: every genuinely-new
    // key should have made it through (held-back FPs would show here)
    val freshTruth = batches.flatten.distinct.filterNot(seedKeys.contains)
    assert(emitted.toSet === freshTruth.toSet,
      s"emitted ${emitted.size} vs ${freshTruth.size} genuinely-new keys")
  }

  test("a replayed batch whose own segment is pre-written rewrites identical output") {
    // the at-least-once retry hole: batch N fails AFTER writing its
    // bits/batch_N segment but BEFORE the checkpoint commit. The re-run
    // must read the state as of BEFORE batch N (bitsBefore), or every
    // batch key probes as member and newPath/batch_N is overwritten empty.
    val statePath = java.nio.file.Files.createTempDirectory("bloom-rt").toString + "/st"
    val newPath = java.nio.file.Files.createTempDirectory("bloom-rtn").toString + "/new"
    BloomStream.seed((1 to 50).map(i => s"seed_$i").toDF("k"), statePath, "k",
      k = 3, mBits = 32768)
    val batch = ((1 to 20).map(i => s"seed_$i") ++ (1 to 30).map(i => s"new_$i")).toDF("k")
    def runBody(id: Long): Unit = {
      // the foreachBatch body, inlined
      val state = BloomStream.bitsBefore(spark, statePath, id)
      Bloom.probe(state, batch.select(col("k")), "k", 3, 32768)
        .where(!col("member")).select(col("k"))
        .write.mode("overwrite").parquet(s"$newPath/batch_$id")
      Bloom.build(batch.select(col("k")), "k", 3, 32768)
        .write.mode("overwrite").parquet(s"$statePath/bits/batch_$id")
    }
    runBody(0L)
    val first = spark.read.parquet(s"$newPath/batch_0")
      .collect().map(_.getString(0)).toSet
    assert(first === (1 to 30).map(i => s"new_$i").toSet)
    runBody(0L) // retry: bits/batch_0 already exists
    val retry = spark.read.parquet(s"$newPath/batch_0")
      .collect().map(_.getString(0)).toSet
    assert(retry === first, "retry with pre-written segment lost the batch's output")
  }

  test("unseeded state is refused loudly") {
    val statePath = java.nio.file.Files.createTempDirectory("bloom-x").toString + "/st"
    val streamDir = writeBatches(Seq(Seq("a")))
    val stream = spark.readStream.schema(Seq("a").toDF("k").schema)
      .parquet(streamDir.toString)
    val e = intercept[IllegalArgumentException] {
      BloomStream.filterNewAvailableNow(stream, statePath, statePath + "/n", "k")
    }
    assert(e.getMessage.contains("not seeded"))
  }
}
