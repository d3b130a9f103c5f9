package graft.streaming

import graft.SparkTestBase
import graft.operators.UnigramLm
import org.apache.spark.sql.DataFrame

class UnigramStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    9L -> "the theme of the thesis",
    2L -> "spark shuffles the data",
    1L -> "the the the common words",
    7L -> "rare xylophone zephyr",
    4L -> "theme and thesis again the theme")

  private def modelRows(df: DataFrame): Set[(String, Long, String)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDecimal(2).toBigInteger.toString)).toSet

  private def streamSplit(batches: Seq[Seq[(Long, String)]]): Set[(String, Long, String)] = {
    val streamDir = java.nio.file.Files.createTempDirectory("unigram-docs")
    val statePath = java.nio.file.Files.createTempDirectory("unigram-state").toString + "/state"
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ub$i").toString + "/w"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    UnigramStream.countsAvailableNow(stream, statePath, "text", maxPieceLen = 4)
    modelRows(UnigramStream.trainFromSegments(spark, statePath,
      maxPieceLen = 4, seedSize = 24, iters = 2))
  }

  test("streamed unigram train over 3 arbitrary micro-batches equals the one-shot train") {
    // NO monotone-id / arrival-order assumption: ids interleave arbitrarily
    val full = modelRows(UnigramLm.train(
      docs.toDF("doc_id", "text"), "text", maxPieceLen = 4, seedSize = 24, iters = 2))
    val streamed = streamSplit(Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)))
    assert(streamed == full, s"streamed=$streamed\nfull=$full")
  }

  test("the streamed model is invariant to the batch split (q202 theorem over segments)") {
    // a completely different partition of the same documents — 2 uneven
    // batches, different interleaving — must produce the byte-identical
    // model, because both count statistics are additive
    val a = streamSplit(Seq(docs.take(2), docs.slice(2, 4), docs.drop(4)))
    val b = streamSplit(Seq(Seq(docs(4), docs(1)), Seq(docs(0), docs(3), docs(2))))
    assert(a == b, s"split A=$a\nsplit B=$b")
  }
}
