package graft.streaming

import graft.SparkTestBase
import graft.operators.HeavyHitters

class HeavyHittersStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed heavy hitters over 3 arbitrary micro-batches equal the full batch recompute") {
    // NO monotone-id assumption: batches interleave ids arbitrarily, and
    // the heavy token is deliberately BELOW the local 1/(k+1) share in
    // batch 1 (the segment-pigeonhole case: seg 0/2 must recover it)
    val batches = Seq(
      Seq(9L -> "the the the the quick brown", 2L -> "the the lazy dog"),
      Seq(1L -> "alpha beta gamma delta the epsilon", 7L -> "eta theta iota kappa"),
      Seq(4L -> "the the the jumps over the"))
    val streamDir = java.nio.file.Files.createTempDirectory("hh-docs")
    val countsPath = java.nio.file.Files.createTempDirectory("hh-counts").toString + "/counts"

    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"hb$i").toString + "/w"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    HeavyHittersStream.countsAvailableNow(stream, countsPath, "text")

    val streamed = HeavyHittersStream.heavyFromSegments(spark, countsPath, k = 4)
      .as[(String, Long, Long)].collect().toSet
    val full = HeavyHitters.ofText(
        batches.flatten.toDF("doc_id", "text"), "text", k = 4)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == full && full.nonEmpty, s"streamed=$streamed\nfull=$full")
  }
}
