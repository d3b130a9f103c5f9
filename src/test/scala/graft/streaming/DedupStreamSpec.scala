package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed incremental candidates over 3 micro-batches equal the full-corpus set") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town near the old stone bridge every single morning"
    val nearDup = base.replace("quick", "swift")
    val unrelated = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    // near-dups planted within one batch (1,2) and across batches (2,5), (1,8)
    val batches = Seq(
      Seq(1L -> base, 2L -> base, 3L -> unrelated),
      Seq(5L -> nearDup, 6L -> unrelated),
      Seq(8L -> base, 9L -> ("spark catalyst " + unrelated)))
    val streamDir = java.nio.file.Files.createTempDirectory("dedup-docs")
    val indexPath = java.nio.file.Files.createTempDirectory("dedup-idx").toString + "/idx"
    val pairsPath = java.nio.file.Files.createTempDirectory("dedup-pairs").toString + "/pairs"

    // one single-file parquet per batch in a common dir; maxFilesPerTrigger=1
    // turns them into three micro-batches of ONE AvailableNow invocation
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"b$i").toString + "/out"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = batches.head.toDF("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    DedupStream.candidatesAvailableNow(stream, indexPath, pairsPath, "text", "doc_id")

    val streamed = spark.read.option("recursiveFileLookup", "true").parquet(pairsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = batches.flatten.toDF("doc_id", "text")
    val full = Dedup.minhashCandidatePairsMd5(all, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === full, s"streamed=$streamed full=$full")
    assert(streamed.contains((1L, 2L)), "within-batch pair")
    assert(streamed.contains((1L, 8L)) && streamed.contains((2L, 8L)),
      "cross-batch exact copies must pair against the stored index")
    // the index root now holds every doc's bands exactly once
    val nIndexDocs = spark.read.option("recursiveFileLookup", "true").parquet(indexPath)
      .select("__id").distinct().count()
    assert(nIndexDocs === batches.flatten.size)
  }
}
