package graft.streaming

import graft.SparkTestBase
import graft.operators.{MediaCodecs, Multimodal}
import org.apache.spark.sql.functions._

class MediaHashStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatches(batches: Seq[Seq[(Long, Long)]]): java.nio.file.Path = {
    val streamDir = java.nio.file.Files.createTempDirectory("mh-rows")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"mh$i").toString + "/out"
      rows.toDF("media_id", "ahash").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    streamDir
  }

  test("union of streamed pair batches equals the full-corpus banded join") {
    // planted hashes: originals + 2-bit siblings split ACROSS batches so
    // cross-batch pairs must come from the stored index
    def h(id: Long): Long = (0 until 64).foldLeft(0L) { (acc, b) =>
      acc | (MediaCodecs.blockBit(id, b).toLong << b)
    }
    val batches = Seq(
      (0L to 19L).map(i => (i, h(i))),                         // originals
      (0L to 9L).map(i => (1000L + i, h(i) ^ 6L)) ++           // siblings of batch-0 ids (flip bits 1,2)
        (20L to 29L).map(i => (i, h(i))),                      // more originals
      (1100L to 1104L).map(i => (i, h(i - 1080L) ^ 6L)))       // siblings of 20..24
    val streamDir = writeBatches(batches)
    val indexPath = java.nio.file.Files.createTempDirectory("mh-idx").toString + "/idx"
    val pairsPath = java.nio.file.Files.createTempDirectory("mh-p").toString + "/pairs"

    val schema = batches.head.toDF("media_id", "ahash").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    MediaHashStream.dedupAvailableNow(stream, indexPath, pairsPath,
      "media_id", "ahash", maxHamming = 3)

    val streamed = spark.read.option("recursiveFileLookup", "true").parquet(pairsPath)
      .select("id_a", "id_b", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val full = Multimodal.hamming64NearDupPairs(
        batches.flatten.toDF("media_id", "ahash"), "media_id", "ahash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(full.nonEmpty, "fixture produced no pairs")
    assert(streamed === full)
    // the planted cross-batch siblings are all found at hamming 2
    assert(full.count(_._3 == 2L) === 15)
  }
}
