package graft.streaming

import graft.SparkTestBase
import graft.operators.Index
import org.apache.spark.sql.functions._

class IndexStreamSpec extends SparkTestBase {

  test("3-batch index stream + merge-on-read equals a full rebuild exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val increment = docs.where(pmod(col("doc_id"), lit(2)) === 1)

    val statePath = java.nio.file.Files.createTempDirectory("idx-state").toString + "/state"
    IndexStream.seedState(corpus, statePath, "text", "doc_id")

    val ids = increment.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val streamDir = java.nio.file.Files.createTempDirectory("idx-docs")
    val parts = Seq(
      increment.where(col("doc_id") <= cuts(0)),
      increment.where(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      increment.where(col("doc_id") > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ib$i").toString + "/out"
      p.select("doc_id", "text").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = parts.head.select("doc_id", "text").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    IndexStream.indexAvailableNow(stream, statePath, "text", "doc_id")

    // one seed + three batch segments on disk, plus the DURABLE
    // checkpoint (underscore-prefixed: invisible to the segment reads,
    // but it must exist so a replay reuses offsets and batch ids)
    val entries = new java.io.File(statePath).listFiles().map(_.getName).toSet
    assert(entries.contains("_checkpoint"))
    val segments = entries.filterNot(_.startsWith("_"))
    assert(segments === Set("seed", "batch_0", "batch_1", "batch_2"))

    val served = IndexStream.currentIndex(spark, statePath, minDf = 2, maxPostings = 20)
      .orderBy("term").collect().map(_.toString).toSeq
    val rebuilt = Index.invertedIndex(docs, "text", "doc_id",
        minDf = 2, maxPostings = 20)
      .orderBy("term").collect().map(_.toString).toSeq
    assert(rebuilt.nonEmpty && served === rebuilt)

    // compaction folds the segments into one, serving the same index
    val compactedPath = java.nio.file.Files.createTempDirectory("idx-compact").toString + "/c"
    IndexStream.compact(spark, statePath, compactedPath)
    assert(new java.io.File(compactedPath).listFiles().map(_.getName).toSeq === Seq("seed"))
    val afterCompact = IndexStream.currentIndex(spark, compactedPath, minDf = 2, maxPostings = 20)
      .orderBy("term").collect().map(_.toString).toSeq
    assert(afterCompact === rebuilt)
  }

  test("mergePartials agrees with the 2-way join merge exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val ia = Index.invertedIndex(a, "text", "doc_id")
    val viaJoin = Index.mergeIndex(ia, b, "text", "doc_id",
        minDf = 3, maxPostings = 12)
      .orderBy("term").collect().map(_.toString).toSeq
    val viaAgg = Index.mergePartials(
        ia.unionByName(Index.invertedIndex(b, "text", "doc_id")),
        minDf = 3, maxPostings = 12)
      .orderBy("term").collect().map(_.toString).toSeq
    assert(viaJoin.nonEmpty && viaAgg === viaJoin)
  }

  test("indexAvailableNow refuses an unseeded state path") {
    import spark.implicits._
    val stream = spark.readStream
      .schema(Seq((1L, "t")).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(java.nio.file.Files.createTempDirectory("idx-empty").toString)
    val e = intercept[IllegalArgumentException] {
      IndexStream.indexAvailableNow(stream,
        java.nio.file.Files.createTempDirectory("idx-nostate").toString + "/state",
        "text", "doc_id")
    }
    assert(e.getMessage.contains("not seeded"))
  }
}
