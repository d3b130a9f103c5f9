package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ClassifierEval, FuzzyJoin, LogReg, MediaCodecs, Multimodal}

/** Round-8 scale proof: the new surfaces under load.
  *
  * 1. Threshold-2 fuzzy join at key-space scale — 60k 32-char md5 keys +
  *    1.2k planted DOUBLE-substitution mutants (mutated to 'z'/'y',
  *    outside the hex alphabet, so every planted pair is at distance
  *    exactly 2 and random hex keys admit no accidental ≤2 neighbors):
  *    the two-level symmetric-delete blocking must recover EXACTLY the
  *    planted pairs through a ~32M-variant equi-join, never a pair scan.
  *
  * 2. MJPEG frame decode at corpus scale — 20k synthesized AVIs (4 real
  *    JPEG frames each = 80k frame decodes) with 400 planted truncations:
  *    every intact asset decodes with its exact planted frame count,
  *    every truncated one quarantines, counts balance to the asset.
  *
  * 3. Mini-batch LogReg at sf0.1 — 2 epochs × 4 md5 batches = 8 filtered
  *    gradient aggregations over the real documents table; weights must
  *    be finite and byte-identical under adversarial repartitioning (the
  *    determinism doctrine holding at scale).
  *
  * 4. Rank-sum AUC at 5M rows — scores quantized to 6 decimals (the
  *    bounded distinct-score contract), labels perfectly separated by
  *    the 0.5 threshold: AUC must be EXACTLY 1.0 (integer rank
  *    arithmetic leaves no room for float drift), one corpus shuffle.
  *
  * Run: `sbt "runMain graft.ScaleProofR8 /root/testdata/sf0.1 SCALEPROOF_r8.json"`
  */
object ScaleProofR8 {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r8.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- 1. editDistanceKJoin t=2: 60k keys + 1.2k planted mutants ----
    val nKeys = 60000L
    val keys = spark.range(nKeys)
      .select(col("id"), md5(col("id").cast("string")).as("s"))
    // every 50th key gets a mutant with substitutions at positions 1 and
    // 17 to letters outside the hex alphabet: distance exactly 2, and a
    // mutant shares no distance-<=2 neighbor except its own source
    val mutants = keys.where(col("id") % 50 === 0)
      .select((col("id") + 10000000L).as("id"),
        concat(lit("z"), substring(col("s"), 2, 15),
          lit("y"), substring(col("s"), 18, 15)).as("s"))
    val corpus = keys.unionByName(mutants).localCheckpoint(true)
    val tF = System.nanoTime()
    val pairs = FuzzyJoin.editDistanceKJoin(corpus, "s", "id", t = 2)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val fuzzySec = secs(tF)
    val planted = nKeys / 50
    val plantedFound = pairs
      .where(col("id_b") === col("id_a") + 10000000L && col("id_a") % 50 === 0 &&
        col("edit_dist") === 2L).count()
    val fuzzyOk = nPairs == planted && plantedFound == planted

    // ---- 2. MJPEG decode: 20k assets, 400 planted truncations ---------
    val nVideos = 20000L
    val media = spark.range(nVideos).map { id =>
      val avi = MediaCodecs.syntheticAviMjpeg(
        ("seed" + id).getBytes("UTF-8"), 16, 12, nFrames = 4, fps = 10)
      val content =
        if (id % 50 == 0) java.util.Arrays.copyOf(avi, avi.length - 11) // truncate
        else avi
      Multimodal.MediaRecord(id, "video", content, "video/x-msvideo",
        Some(16), Some(12), None, Some(400L))
    }
    val tM = System.nanoTime()
    val stats = Multimodal.mjpegFrameStats(media).localCheckpoint(true)
    val nAssets = stats.count()
    val mjpegSec = secs(tM)
    val nDecoded = stats.where(col("decoded") &&
      col("n_frames") === 4L && col("width") === 16L && col("height") === 12L).count()
    val nQuarantined = stats.where(!col("decoded")).count()
    val expectedQuarantine = (0L until nVideos).count(_ % 50 == 0).toLong
    val mjpegOk = nAssets == nVideos && nQuarantined == expectedQuarantine &&
      nDecoded == nVideos - expectedQuarantine

    // ---- 3. Mini-batch LogReg at sf0.1: determinism at scale ----------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
    val feats = Seq(
      "x_chars" -> (col("n_chars").cast("double") / lit(1000.0)),
      "x_tokens" -> (size(split(trim(lower(col("text"))), "\\s+")).cast("double") / lit(100.0)))
    val label = when(col("lang") === "en", 1.0).otherwise(0.0)
    val tL = System.nanoTime()
    val (names, w1) = LogReg.fitWeightsMiniBatch(docs, "doc_id", feats, label,
      epochs = 2, batches = 4, lr = 0.5)
    val logregSec = secs(tL)
    val (_, w2) = LogReg.fitWeightsMiniBatch(docs.repartition(41, col("lang")),
      "doc_id", feats, label, epochs = 2, batches = 4, lr = 0.5)
    val logregOk = w1.forall(v => !v.isNaN && !v.isInfinite) && w1.sameElements(w2)

    // ---- 4. Rank-sum AUC over 5M separable rows -----------------------
    val nRows = 5000000L
    val scored = spark.range(nRows).select(
      (round((col("id") % 999983L).cast("double") / 999983.0, 6)).as("score"),
      ((col("id") % 999983L) > 499991L).cast("double").as("y"))
    val tA = System.nanoTime()
    val m = ClassifierEval.binaryMetrics(scored, "score", "y", threshold = 0.5)
      .collect().head
    val aucSec = secs(tA)
    val auc = m.getAs[Double]("auc")
    val aucOk = auc == 1.0 &&
      m.getAs[Long]("n_pos") + m.getAs[Long]("n_neg") == nRows

    val json =
      s"""{"metric":"scaleproof_r8","sf_dir":"$sfDir",
         |"fuzzy_join_t2":{"keys":${nKeys + planted},"planted_pairs":$planted,
         |"wall_sec":${f"$fuzzySec%.1f"},"pairs_found":$nPairs,
         |"planted_found":$plantedFound,"ok":$fuzzyOk},
         |"mjpeg_decode":{"assets":$nVideos,"frame_decodes":${4 * (nVideos - expectedQuarantine)},
         |"planted_truncations":$expectedQuarantine,"wall_sec":${f"$mjpegSec%.1f"},
         |"decoded_exact":$nDecoded,"quarantined":$nQuarantined,"ok":$mjpegOk},
         |"logreg_minibatch":{"rows":${docs.count()},"steps":8,
         |"wall_sec":${f"$logregSec%.1f"},"weights":${w1.mkString("[", ",", "]")},
         |"repartition_invariant":${w1.sameElements(w2)},"ok":$logregOk},
         |"auc_ranksum":{"rows":$nRows,"wall_sec":${f"$aucSec%.1f"},
         |"auc":$auc,"ok":$aucOk}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(fuzzyOk, s"t=2 fuzzy join failed: pairs=$nPairs planted_found=$plantedFound of $planted")
    require(mjpegOk, s"MJPEG proof failed: decoded=$nDecoded quarantined=$nQuarantined of $nVideos")
    require(logregOk, s"mini-batch LogReg failed: w1=${w1.toSeq} w2=${w2.toSeq}")
    require(aucOk, s"AUC proof failed: auc=$auc")
    Sessions.release(spark, owned)
  }
}
