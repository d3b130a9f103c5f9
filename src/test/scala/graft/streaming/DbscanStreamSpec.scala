package graft.streaming

import graft.SparkTestBase
import graft.operators.{Dbscan, Dedup}
import org.apache.spark.sql.functions._

class DbscanStreamSpec extends SparkTestBase {

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select("vid", "role", "cluster").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .sorted.toSeq

  test("3-batch DBSCAN stream equals the one-shot recompute exactly; compaction preserves") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val increment = emb.where(pmod(col("vec_id"), lit(2)) === 1)

    val statePath = java.nio.file.Files.createTempDirectory("dbscan-state").toString + "/state"
    DbscanStream.seedState(corpus, statePath, "embedding", "vec_id",
      threshold = 0.4, planes = 4, dim = 64)

    // three file-batches of the increment (maxFilesPerTrigger=1)
    val ids = increment.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val streamDir = java.nio.file.Files.createTempDirectory("dbscan-vecs")
    val parts = Seq(
      increment.where(col("vec_id") <= cuts(0)),
      increment.where(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1)),
      increment.where(col("vec_id") > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"db$i").toString + "/out"
      p.select("vec_id", "embedding").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val schema = parts.head.select("vec_id", "embedding").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    DbscanStream.ingestAvailableNow(stream, statePath, "embedding", "vec_id",
      threshold = 0.4, planes = 4, dim = 64)

    val segs = new java.io.File(s"$statePath/edges").listFiles().map(_.getName).toSet
    assert(segs === Set("seed", "batch_0", "batch_1", "batch_2"))

    // edge-union exactness: segments == one-shot pair generation over the
    // full corpus (every unordered pair exactly once)
    val streamedEdges = DbscanStream.currentEdges(spark, statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneShotEdges = Dedup.embeddingNearDupsDet(emb, "embedding", "vec_id",
        threshold = 0.4, planes = 4, dim = 64)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(oneShotEdges.nonEmpty && streamedEdges === oneShotEdges)

    // the q193 theorem over segments: streamed clustering == full recompute
    val streamed = key(DbscanStream.clusters(spark, statePath, minPts = 2))
    val oneShot = key(Dbscan.fromPairs(emb, "vec_id",
      Dedup.embeddingNearDupsDet(emb, "embedding", "vec_id",
        threshold = 0.4, planes = 4, dim = 64).select("id_a", "id_b"),
      "id_a", "id_b", minPts = 2))
    assert(streamed === oneShot)
    // the stream must actually have clustered something
    assert(streamed.exists(_._2 == "core"))

    // compaction folds segments without changing the clustering
    val compacted = java.nio.file.Files.createTempDirectory("dbscan-compact").toString + "/state"
    DbscanStream.compact(spark, statePath, compacted)
    assert(key(DbscanStream.clusters(spark, compacted, minPts = 2)) === streamed)
  }

  test("priorIndex hides the current batch's own segment (replay purity)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val statePath = java.nio.file.Files.createTempDirectory("dbscan-replay").toString + "/state"
    DbscanStream.seedState(emb.where(col("vec_id") % 2 === 0), statePath,
      "embedding", "vec_id", threshold = 0.4, planes = 4, dim = 64)
    // simulate a half-written batch_1 segment from a failed attempt
    Dedup.signPlaneIndex(emb.where(col("vec_id") % 2 === 1), "embedding",
        "vec_id", planes = 4, dim = 64)
      .write.parquet(s"$statePath/index/batch_1")
    val seen = DbscanStream.priorIndex(spark, statePath, batchId = 1)
      .select("__id").collect().map(_.getLong(0)).toSet
    val seedIds = emb.where(col("vec_id") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // batch 1 sees ONLY the seed — its own failed segment is invisible
    assert(seen === seedIds)
    // batch 2 sees seed + batch_1
    val seen2 = DbscanStream.priorIndex(spark, statePath, batchId = 2)
      .select("__id").collect().map(_.getLong(0)).toSet
    assert(seen2 === emb.select("vec_id").collect().map(_.getLong(0)).toSet)
  }
}
