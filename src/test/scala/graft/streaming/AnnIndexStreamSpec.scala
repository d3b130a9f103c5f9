package graft.streaming

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class AnnIndexStreamSpec extends SparkTestBase {

  test("3-batch ANN stream equals the one-shot index exactly; serving matches; compaction preserves") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val increment = emb.where(pmod(col("vec_id"), lit(2)) === 1)

    val statePath = java.nio.file.Files.createTempDirectory("ann-state").toString + "/state"
    AnnIndexStream.seedState(corpus, statePath, "embedding", "vec_id", numCentroids = 8)

    // three file-batches of the increment
    val ids = increment.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val streamDir = java.nio.file.Files.createTempDirectory("ann-vecs")
    val parts = Seq(
      increment.where(col("vec_id") <= cuts(0)),
      increment.where(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1)),
      increment.where(col("vec_id") > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ab$i").toString + "/out"
      p.select("vec_id", "embedding").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = parts.head.select("vec_id", "embedding").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    AnnIndexStream.indexAvailableNow(stream, statePath, "embedding", "vec_id")

    val segments = new java.io.File(s"$statePath/lists").listFiles().map(_.getName).toSet
    assert(segments === Set("seed", "batch_0", "batch_1", "batch_2"))

    // the q175 theorem, streamed: segments union == one-shot full index
    // against the SAME stored centroids
    val cents = spark.read.parquet(s"$statePath/centroids")
    val streamed = AnnIndexStream.currentLists(spark, statePath)
      .select("list_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneShot = Similarity.ivfIndex(emb, "embedding", "vec_id", cents)
      .select("list_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(oneShot.nonEmpty && streamed === oneShot)

    // serving off the segment store == serving off the one-shot index
    val queries = emb.where(pmod(col("vec_id"), lit(40)) === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val servedStream = key(AnnIndexStream.serveTopK(spark, statePath, queries,
      "embedding", "vec_id", k = 3, numProbe = 3))
    val servedOneShot = key(Similarity.ivfTopKWithCentroids(queries, emb,
      "embedding", "vec_id", k = 3, cents, numProbe = 3))
    assert(servedStream.nonEmpty && servedStream === servedOneShot)

    // compaction: one seed segment, identical service, model untouched
    val compactedPath = java.nio.file.Files.createTempDirectory("ann-compact").toString + "/c"
    AnnIndexStream.compact(spark, statePath, compactedPath)
    assert(new java.io.File(s"$compactedPath/lists").listFiles().map(_.getName).toSeq === Seq("seed"))
    val servedCompact = key(AnnIndexStream.serveTopK(spark, compactedPath, queries,
      "embedding", "vec_id", k = 3, numProbe = 3))
    assert(servedCompact === servedOneShot)
    val centsBack = spark.read.parquet(s"$compactedPath/centroids")
      .select("__cid").collect().map(_.getLong(0)).sorted.toSeq
    assert(centsBack === cents.select("__cid").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("an unseeded state fails loudly; a replayed batch rewrites identical content") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val e = intercept[IllegalArgumentException] {
      AnnIndexStream.indexAvailableNow(
        spark.readStream.schema(emb.schema)
          .parquet(java.nio.file.Files.createTempDirectory("ann-none").toString),
        java.nio.file.Files.createTempDirectory("ann-unseeded").toString + "/state",
        "embedding", "vec_id")
    }
    assert(e.getMessage.contains("not seeded"))

    // replay: the segment is a pure function of (batch, stored centroids)
    val statePath = java.nio.file.Files.createTempDirectory("ann-replay").toString + "/state"
    AnnIndexStream.seedState(emb.where(col("vec_id") < 25), statePath,
      "embedding", "vec_id", numCentroids = 4)
    val cents = spark.read.parquet(s"$statePath/centroids")
    val batch = emb.where(col("vec_id") >= 25)
    def writeOnce(): Seq[(Long, Long)] = {
      Similarity.ivfIndex(batch, "embedding", "vec_id", cents)
        .write.mode("overwrite").parquet(s"$statePath/lists/batch_0")
      spark.read.parquet(s"$statePath/lists/batch_0")
        .select("list_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val first = writeOnce()
    val replay = writeOnce()
    assert(first.nonEmpty && first === replay)
  }
}
