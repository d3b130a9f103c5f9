package graft.streaming

import graft.SparkTestBase
import graft.operators.WordPiece

class VocabStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed vocab over 3 arbitrary micro-batches equals the full retrain (additive counts)") {
    // NO monotone-id assumption: batches interleave ids arbitrarily
    val batches = Seq(
      Seq(9L -> "the theme of the thesis", 2L -> "spark shuffles the data"),
      Seq(1L -> "the the the common words", 7L -> "rare xylophone zephyr"),
      Seq(4L -> "theme and thesis again the theme"))
    val streamDir = java.nio.file.Files.createTempDirectory("vocab-docs")
    val countsPath = java.nio.file.Files.createTempDirectory("vocab-counts").toString + "/counts"

    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"vb$i").toString + "/w"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    VocabStream.countsAvailableNow(stream, countsPath, "text", maxPieceLen = 4)

    val streamed = VocabStream.vocabFromSegments(spark, countsPath, vocabSize = 32)
      .as[(String, Long, Long)].collect().toSet
    val full = WordPiece.induceVocab(
        batches.flatten.toDF("doc_id", "text"), "text", maxPieceLen = 4, vocabSize = 32)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == full, s"streamed=$streamed\nfull=$full")
  }
}
