package graft.streaming

import graft.SparkTestBase
import graft.operators.SuffixDedup
import org.apache.spark.sql.functions._

class SuffixDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed strip over 3 monotone micro-batches equals the full-corpus keep-first strip") {
    val boiler = "subscribe to our newsletter for daily updates and offers"
    val tail = "unique closing thought number"
    // boilerplate repeats within batch 0 (docs 1,2), across batches
    // (docs 1->5, 1->8), and doc 6 is clean; ids are monotone per batch
    val batches = Seq(
      Seq(1L -> s"$boiler $tail one", 2L -> s"intro words here $boiler"),
      Seq(5L -> s"$boiler $tail five", 6L -> "completely fresh text with no repeated span at all"),
      Seq(8L -> s"final doc where $boiler appears once more"))
    val streamDir = java.nio.file.Files.createTempDirectory("sfx-docs")
    val firstsPath = java.nio.file.Files.createTempDirectory("sfx-firsts").toString + "/firsts"
    val outPath = java.nio.file.Files.createTempDirectory("sfx-out").toString + "/out"

    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"sb$i").toString + "/w"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    SuffixDedupStream.stripAvailableNow(stream, firstsPath, outPath, "text", "doc_id", minLen = 5)

    val streamed = spark.read.option("recursiveFileLookup", "true").parquet(outPath)
      .as[(Long, Long, Long, String)].collect().toSet
    val full = SuffixDedup.stripAllButFirst(
        batches.flatten.toDF("doc_id", "text"), "text", "doc_id", minLen = 5)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == full, s"streamed=$streamed\nfull=$full")
    // sanity on the semantics, not just the twin equality: doc 1 keeps
    // the boilerplate (first occurrence), docs 2/5/8 lose those 9 tokens
    val byId = streamed.toSeq.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 == 0L, "doc 1 is the first occurrence and keeps every token")
    assert(byId(2L)._3 == 9L && byId(8L)._3 == 9L,
      "boilerplate-only carriers lose exactly the 9 boilerplate tokens")
    assert(byId(5L)._3 == 13L,
      "doc 5 shares the 13-token boiler+tail prefix with doc 1, all stripped")
    assert(byId(6L)._3 == 0L, "the clean doc is untouched")

    // the folded LSM state equals the batch-form gramFirsts of the corpus
    val foldedState = spark.read.option("recursiveFileLookup", "true").parquet(firstsPath)
      .groupBy(col("gram"))
      .agg(min(struct(col("first_id").as("i"), col("first_pos").as("p"))).as("f"))
      .select(col("gram"), col("f.i"), col("f.p"))
      .as[(String, Long, Int)].collect().toSet
    val batchState = SuffixDedup.gramFirsts(
        batches.flatten.toDF("doc_id", "text"), "text", "doc_id", minLen = 5)
      .as[(String, Long, Int)].collect().toSet
    assert(foldedState == batchState)
  }

  test("stripIncrementAndFirsts matches the two separate calls") {
    val stored = SuffixDedup.gramFirsts(
      Seq(1L -> "a b c d e f g").toDF("doc_id", "text"), "text", "doc_id", minLen = 5)
    val inc = Seq(3L -> "x a b c d e f g y", 4L -> "x a b c d e f g y").toDF("doc_id", "text")
    val (stripped, firsts) =
      SuffixDedup.stripIncrementAndFirsts(stored, inc, "text", "doc_id", minLen = 5)
    val strippedRef = SuffixDedup.stripIncrement(stored, inc, "text", "doc_id", minLen = 5)
    assert(stripped.orderBy("doc_id").collect().toSeq ==
      strippedRef.orderBy("doc_id").collect().toSeq)
    val firstsRef = SuffixDedup.gramFirsts(inc, "text", "doc_id", minLen = 5)
    assert(firsts.orderBy("gram").collect().toSeq ==
      firstsRef.orderBy("gram").collect().toSeq)
  }
}
