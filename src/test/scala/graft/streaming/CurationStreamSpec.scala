package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationStreamSpec extends SparkTestBase {

  test("3-batch curation stream is byte-identical to the one-shot q84 batch job") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // q84's split: even ids are the existing corpus, odd ids the increment
    val corpus = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val increment = docs.where(pmod(col("doc_id"), lit(2)) === 1)

    val statePath = java.nio.file.Files.createTempDirectory("cur-state").toString + "/state"
    val verdictPath = java.nio.file.Files.createTempDirectory("cur-verdict").toString + "/v"
    CurationStream.seedState(corpus, statePath, "text", "doc_id")

    // the increment in THREE id-ordered micro-batches (arrival-priority ==
    // q84's lower-id-priority only when arrival follows id order)
    val ids = increment.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val streamDir = java.nio.file.Files.createTempDirectory("cur-docs")
    val parts = Seq(
      increment.where(col("doc_id") <= cuts(0)),
      increment.where(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      increment.where(col("doc_id") > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"cb$i").toString + "/out"
      p.select("doc_id", "text", "lang").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = parts.head.select("doc_id", "text", "lang").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    CurationStream.curateAvailableNow(stream, statePath, verdictPath,
      "text", "doc_id", "lang")

    val streamed = spark.read.option("recursiveFileLookup", "true").parquet(verdictPath)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep"),
        r.getAs[String]("reason"))).toSet
    val batch = graft.queries.DocQueries.q84IncrementalCuration(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep"),
        r.getAs[String]("reason"))).toSet
    assert(streamed.size === batch.size,
      s"row counts differ: streamed=${streamed.size} batch=${batch.size}")
    val onlyStream = streamed -- batch
    val onlyBatch = batch -- streamed
    assert(onlyStream.isEmpty && onlyBatch.isEmpty,
      s"verdicts diverge: stream-only=$onlyStream batch-only=$onlyBatch")
    // the state grew: every increment doc's bands are now in the index
    val nIndexed = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$statePath/bands").select("__id").distinct().count()
    assert(nIndexed === docs.count())
  }

  test("curateAvailableNow refuses an unseeded state path") {
    import spark.implicits._
    val stream = spark.readStream
      .schema(Seq((1L, "t", "en")).toDF("doc_id", "text", "lang").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(java.nio.file.Files.createTempDirectory("cur-empty").toString)
    val e = intercept[IllegalArgumentException] {
      CurationStream.curateAvailableNow(stream,
        java.nio.file.Files.createTempDirectory("cur-nostate").toString + "/state",
        java.nio.file.Files.createTempDirectory("cur-v2").toString + "/v",
        "text", "doc_id", "lang")
    }
    assert(e.getMessage.contains("not seeded"))
  }
}
