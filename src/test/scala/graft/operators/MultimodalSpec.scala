package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.mediaFromDocuments(spark, docs)

  test("media table: binary payload + typed metadata per modality") {
    val rows = media.toDF().limit(500).cache()
    assert(rows.count() === 500L)
    val img = rows.where(col("modality") === "image").limit(1).collect()(0)
    assert(img.getAs[String]("mime_type") === "image/png")
    assert(img.getAs[Int]("width") === 640)
    val aud = rows.where(col("modality") === "audio").limit(1).collect()(0)
    assert(aud.getAs[Int]("sample_rate") === 16000)
    assert(aud.isNullAt(aud.fieldIndex("width")))
  }

  test("feature extraction: deterministic fixed-width vectors via mapPartitions") {
    val feats = Multimodal.extractFeatures(media).toDF().cache()
    assert(feats.count() === 500L)
    val r = feats.orderBy("media_id").limit(1).collect()(0)
    assert(r.getAs[scala.collection.Seq[Float]]("feature").length === Multimodal.FeatureDim)
    // deterministic: rerun matches
    val r2 = Multimodal.extractFeatures(media).toDF().orderBy("media_id").limit(1).collect()(0)
    assert(r.getAs[scala.collection.Seq[Float]]("feature").toList === r2.getAs[scala.collection.Seq[Float]]("feature").toList)
    assert(r.getAs[String]("content_digest").length === 32)
  }

  test("binaryFile asset path: externally-stored payloads join metadata and match the inline path") {
    import spark.implicits._
    // materialize a few docs as individual asset files, the large-asset
    // layout the binaryFile source exists for
    val sample = docs.orderBy("doc_id").limit(20)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("assets")
    sample.foreach { case (id, text) =>
      java.nio.file.Files.write(dir.resolve(s"asset_$id.bin"), text.getBytes("UTF-8"))
    }
    val meta = sample.map { case (id, _) =>
      (s"asset_$id.bin", id, "image", "image/png", Some(640), Some(480),
        None: Option[Int], None: Option[Long])
    }.toSeq.toDF("asset_name", "media_id", "modality", "mime_type",
      "width", "height", "sample_rate", "duration_ms")
    val external = Multimodal.mediaFromBinaryFiles(spark, dir.toString, meta)
    val extFeats = Multimodal.extractFeatures(external).toDF()
      .select("media_id", "content_digest").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the inline (parquet-embedded) path must produce byte-identical payloads
    val inlineFeats = Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(spark, docs.where(col("doc_id").isin(sample.map(_._1): _*))))
      .toDF().select("media_id", "content_digest").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(extFeats.size === 20)
    assert(extFeats === inlineFeats)
  }

  test("resize stub truncates payloads preserving schema") {
    val resized = Multimodal.resize(media, targetBytes = 32).toDF()
    val lens = resized.select(octet_length(col("content")).as("l")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSet === Set(32))
  }

  test("frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2)
    val n = frames.count()
    assert(n > 0)
    val videoIds = media.toDF().where(col("modality") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val frameIds = frames.select("media_id").distinct().collect().map(_.getLong(0)).toSet
    assert(frameIds.subsetOf(videoIds))
  }
}
