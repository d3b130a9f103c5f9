package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Lsa, Multimodal}

/** Round-8f scale proof: the perceptual-hash media family at corpus scale
  * and the relational LSA power iteration at 10M nonzeros.
  *
  * 1. Images: 550k planted block PPMs (500k originals + 50k 2-bit
  *    siblings) REALLY encode, decode and hash through the P6 + aHash
  *    kernels; the banded near-dup join must return EXACTLY the 50k
  *    planted pairs at Hamming 2 (random patterns sit ~32 bits apart —
  *    zero accidental pairs at threshold 3).
  * 2. Audio: the same plant at 110k WAVs (16k samples each) through the
  *    RIFF/PCM energy-envelope kernel — same exactness contract.
  * 3. LSA: a 100k×100 sparse matrix (10M nnz) with a planted dominant
  *    column (constant 50 vs hash noise in [0,1)) — two power steps must
  *    put >0.99 of the loading on the planted column.
  *
  * Run: `sbt "runMain graft.ScaleProofR8f /root/testdata/sf0.1 SCALEPROOF_r8f.json"`
  */
object ScaleProofR8f {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r8f.json")
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
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- 1. image aHash at 550k assets -------------------------------
    val nImg = 500000L
    val imgDocs = spark.range(nImg).select(col("id").as("doc_id"))
    val tI = System.nanoTime()
    val imgHashes = Multimodal.imageAHash(
        Multimodal.mediaBlockImages(spark, imgDocs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nImgHashed = imgHashes.count()
    val imgHashSec = secs(tI)
    val tIP = System.nanoTime()
    val imgPairs = Multimodal.hamming64NearDupPairs(
      imgHashes.where(col("decoded")), "media_id", "ahash", maxHamming = 3)
    val imgAgg = imgPairs.agg(
      count(lit(1)).as("n"),
      sum(when(col("hamming") === 2 &&
        col("id_b") === col("id_a") + Multimodal.BlockSiblingOffset, 1L)
        .otherwise(0L)).as("planted")).head
    val imgPairSec = secs(tIP)
    val undecodedImg = imgHashes.where(!col("decoded")).count()
    imgHashes.unpersist()
    val imgOk = nImgHashed == nImg + nImg / 10 && undecodedImg == 0L &&
      imgAgg.getLong(0) == nImg / 10 && imgAgg.getLong(1) == nImg / 10

    // ---- 2. audio fingerprint at 110k assets -------------------------
    val nAud = 100000L
    val audDocs = spark.range(nAud).select(col("id").as("doc_id"))
    val tA = System.nanoTime()
    val audHashes = Multimodal.audioFingerprint(
        Multimodal.mediaBlockAudio(spark, audDocs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAudHashed = audHashes.count()
    val audHashSec = secs(tA)
    val audPairs = Multimodal.hamming64NearDupPairs(
      audHashes.where(col("decoded")), "media_id", "ahash", maxHamming = 3)
    val audAgg = audPairs.agg(
      count(lit(1)).as("n"),
      sum(when(col("hamming") === 2, 1L).otherwise(0L)).as("h2")).head
    audHashes.unpersist()
    val audOk = nAudHashed == nAud + nAud / 10 &&
      audAgg.getLong(0) == nAud / 10 && audAgg.getLong(1) == nAud / 10

    // ---- 3. LSA at 10M nnz -------------------------------------------
    val rows = 100000L
    val colsN = 100
    val mat = spark.range(rows).select(col("id").as("r"),
        explode(array((0 until colsN).map(j =>
          struct(lit(s"t$j").as("c"),
            (if (j == 7) lit(50.0)
            else (pmod(xxhash64(col("id"), lit(j)), lit(1000L)).cast("double") / 1000.0))
              .as("v"))): _*)).as("__e"))
      .select(col("r"), col("__e.c").as("c"), col("__e.v").as("v"))
    val tL = System.nanoTime()
    val top = Lsa.topTermVector(mat, "r", "c", "v", iterations = 2, k = 3)
      .collect()
    val lsaSec = secs(tL)
    val lsaOk = top.head.getString(0) == "t7" && top.head.getDouble(1) > 0.99

    val json =
      s"""{"metric":"scaleproof_r8f","image_ahash":{"assets":${nImg + nImg / 10},""" +
      s""""hash_sec":${f"$imgHashSec%.1f"},"pair_sec":${f"$imgPairSec%.1f"},""" +
      s""""undecoded":$undecodedImg,"pairs":${imgAgg.getLong(0)},"planted":${nImg / 10},""" +
      s""""planted_found":${imgAgg.getLong(1)},"ok":$imgOk},""" +
      s""""audio_fingerprint":{"assets":${nAud + nAud / 10},"hash_sec":${f"$audHashSec%.1f"},""" +
      s""""pairs":${audAgg.getLong(0)},"planted":${nAud / 10},"ok":$audOk},""" +
      s""""lsa":{"nnz":${rows * colsN},"iterations":2,"wall_sec":${f"$lsaSec%.1f"},""" +
      s""""top_col":"${top.head.getString(0)}","top_loading":${top.head.getDouble(1)},"ok":$lsaOk}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
