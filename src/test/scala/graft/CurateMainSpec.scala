package graft

import org.apache.spark.sql.functions._

class CurateMainSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("curate: every input row is accounted for; outputs carry split/phase/shard") {
    val (out, counts) = CurateMain.curate(spark, docs, numShards = 4)
    val rows = out.collect()
    assert(counts("input") === docs.count())
    assert(counts("kept") === rows.length.toLong)
    val drops = counts.collect { case (k, v) if k.startsWith("dropped_") => v }.sum
    assert(counts("input") === counts("kept") + drops,
      s"stage accounting must balance: $counts")
    // every kept row is routable: valid split, phase 1..4, shard 0..3
    rows.foreach { r =>
      assert(Set("train", "validation", "test").contains(r.getAs[String]("split")))
      val p = r.getAs[Long]("phase")
      assert(p >= 1L && p <= 4L)
      val s = r.getAs[Long]("shard")
      assert(s >= 0L && s <= 3L)
    }
    // curation dropped something on this corpus (it has planted dups)
    assert(drops > 0, "expected the sf0.001 corpus to lose rows to curation")
  }

  test("curate is deterministic end to end") {
    val (a, ca) = CurateMain.curate(spark, docs, numShards = 4)
    val (b, cb) = CurateMain.curate(spark, docs.repartition(13), numShards = 4)
    assert(ca === cb, "manifest counts must not depend on partitioning")
    val ka = a.select("doc_id", "split", "phase", "shuffle_key", "shard")
      .collect().map(_.toString).sorted.toSeq
    val kb = b.select("doc_id", "split", "phase", "shuffle_key", "shard")
      .collect().map(_.toString).sorted.toSeq
    assert(ka === kb, "routing must be a pure function of the rows")
  }

  test("curate keep/drop verdicts equal q83's oracle-checked chain") {
    // the CLI's verdict chain must not drift from the hash-checked q83
    // query: same keep set, same per-reason drop counts — with ONE
    // documented divergence: rows whose n_chars is null cannot be
    // curriculum-scored, so curate accounts them as dropped_no_score
    // (q83 never scores and keeps them)
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (sharded, counts) = CurateMain.curate(spark, docs, numShards = 4)
    val q83 = graft.queries.DocQueries.q83Curation(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val kept = sharded.select("doc_id").collect().map(_.getLong(0)).toSet
    val noScore = docs.where(col("n_chars").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === q83.filter(_._2 == "keep").keySet -- noScore)
    assert(counts("kept") === kept.size.toLong)
    // manifest equals the actual output — no silent inner-join losses
    assert(sharded.count() === counts("kept"))
    val q83Reasons = q83.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (r <- Seq("exact_dup", "near_dup", "too_short", "lang_filtered"))
      assert(counts.getOrElse(s"dropped_$r", 0L) === q83Reasons.getOrElse(r, 0L),
        s"reason $r count drifted from q83")
  }

  test("main writes split/shard-partitioned parquet and a balancing manifest") {
    val outDir = java.nio.file.Files.createTempDirectory("curate-out").toString
    val docsDir = "/root/testdata/sf0.001"
    CurateMain.main(Array(s"$docsDir/documents.parquet", outDir, "4"))
    // main's getOrCreate JOINS this JVM's shared test session; the
    // Sessions ownership guard means main must NOT have stopped it.
    assert(!spark.sparkContext.isStopped,
      "CurateMain.main must never stop a session it joined")
    val curated = spark.read.parquet(s"$outDir/curated")
    val manifest = ujsonish(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/manifest.json")))
    assert(curated.count() === manifest("kept"))
    assert(curated.select("split").distinct().count() >= 2)
    assert(manifest("input") === 500L)
  }

  test("media path: decode failures quarantine as dropped_undecodable and the manifest balances") {
    import spark.implicits._
    import graft.operators.{MediaCodecs, Multimodal}
    // mixed corpus: 30 genuinely decodable real assets + 3 planted
    // undecodables (truncated AVI, garbage WAV, garbage PNG)
    val good = Multimodal.mediaRealAssets(spark,
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30))
    val truncatedAvi = {
      val avi = MediaCodecs.syntheticAviMjpeg("x".getBytes("UTF-8"), 16, 12, 3, 10)
      java.util.Arrays.copyOf(avi, avi.length - 9)
    }
    val bad = Seq(
      Multimodal.MediaRecord(9001L, "video", truncatedAvi, "video/x-msvideo",
        Some(16), Some(12), None, Some(300L)),
      Multimodal.MediaRecord(9002L, "audio", "not audio at all".getBytes("UTF-8"),
        "audio/wav", None, None, Some(16000), Some(1L)),
      Multimodal.MediaRecord(9003L, "image", Array[Byte](1, 2, 3, 4), "image/png",
        Some(8), Some(8), None, None)).toDS()
    val mixed = good.union(bad)

    val (kept, counts) = CurateMain.curateMedia(spark, mixed)
    assert(counts("media_input") === 33L)
    assert(counts("media_dropped_undecodable") === 3L,
      s"exactly the planted corrupt assets quarantine: $counts")
    assert(counts("media_kept") === 30L)
    assert(counts("media_input") === counts("media_kept") + counts("media_dropped_undecodable"))
    // every surviving row really decoded: marker plane is never the stub's
    val keptRows = kept.collect()
    assert(keptRows.length === 30)
    keptRows.foreach { r =>
      val marker = r.getAs[scala.collection.Seq[Float]]("feature").head
      assert(Set(1.0f, 2.0f, 3.0f, 4.0f).contains(marker),
        s"kept row ${r.getAs[Long]("media_id")} carries stub marker $marker")
    }

    // the CLI end-to-end: mixed corpus through main, manifest balances
    val mediaDir = java.nio.file.Files.createTempDirectory("curate-media").toString
    mixed.toDF().write.mode("overwrite").parquet(mediaDir)
    val outDir = java.nio.file.Files.createTempDirectory("curate-out-m").toString
    CurateMain.main(Array("/root/testdata/sf0.001/documents.parquet", outDir, "4", mediaDir))
    assert(!spark.sparkContext.isStopped)
    val manifest = ujsonish(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/manifest.json")))
    assert(manifest("media_input") === 33L)
    assert(manifest("media_dropped_undecodable") === 3L)
    assert(manifest("media_kept") === 30L)
    assert(spark.read.parquet(s"$outDir/media_features").count() === 30L)
  }

  /** Minimal flat {"k":123,...} parser — no JSON library on the classpath. */
  private def ujsonish(s: String): Map[String, Long] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",")
      .map(_.split(":")).map(a => a(0).replaceAll("\"", "") -> a(1).trim.toLong)
      .toMap
}
