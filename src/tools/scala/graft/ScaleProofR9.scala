package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Hits, LabelProp, Multimodal, Privacy}

/** Round-9 scale proof: the newcomers at 100-TB-shaped sizes.
  *
  * 1. t-closeness at 10M rows / 1000 classes / 10 sensitive values: a
  *    planted fully-skewed class (every row = value 9) must rank top by
  *    EMD and fail closeness while the hash-uniform classes pass;
  *    class sizes and the grid are exact by construction.
  * 2. HITS at 5M+ edges over a 100k × 50k bipartite graph with a
  *    planted super-authority (in-edges from every hub) — it must take
  *    the top authority score; both score vectors L1-sum to ~1.
  * 3. Label propagation at 2M nodes / 1.8M edges (200k disjoint
  *    10-node paths, head-seeded): after k rounds EXACTLY the nodes
  *    ≤ k hops from their seed are labeled, each with its path's label
  *    — reach and label both exactly verifiable.
  * 4. MJPEG-in-MP4 decode at 10k real assets (~50k frame decodes
  *    through the sample-table walk + JPEG kernel), with every id%5==4
  *    asset tail-truncated and quarantined exactly.
  * 5. SCD2 merge at 10M open keys: 1M changed, ~769k missing, ~923k
  *    new — category counts exact by congruence arithmetic, one open
  *    row per live key.
  *
  * Run: `sbt "runMain graft.ScaleProofR9 unused SCALEPROOF_r09.json"`
  */
object ScaleProofR9 {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r09.json")
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

    // ---- 1. t-closeness at 10M rows ----------------------------------
    val nTc = 10000000L
    val tcRows = spark.range(nTc).select(
      (col("id") % 1000).as("q"),
      when(col("id") % 1000 === 777, lit(9L))
        .otherwise(pmod(xxhash64(col("id")), lit(10L))).as("v"))
    val tTc = System.nanoTime()
    val tc = Privacy.tClosenessClasses(tcRows, Seq("q"), "v", t = 0.2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClasses = tc.count()
    val tcSec = secs(tTc)
    val top = tc.orderBy(col("emd").desc).limit(1).head
    val planted = tc.where(col("q") === 777).head
    val sumN = tc.agg(sum(col("n"))).head.getLong(0)
    val nClose = tc.where(col("close") === 1).count()
    tc.unpersist()
    // the planted class: p=(0..0,1) vs near-uniform corpus → EMD ≈
    // (1+2+...+9)/10 / 9 = 0.5 — far above every hash-uniform class
    val tcOk = nClasses == 1000L && sumN == nTc &&
      top.getAs[Long]("q") == 777L && planted.getAs[Long]("close") == 0L &&
      planted.getAs[Double]("emd") > 0.45 && nClose == 999L

    // ---- 2. HITS at 5M+ edges ----------------------------------------
    val nHubs = 100000L
    val sparse = spark.range(5000000L).select(
      (col("id") % nHubs).as("s"),
      (lit(1000000L) + pmod(xxhash64(col("id")), lit(50000L)) + 1).as("d"))
    val star = spark.range(nHubs).select(col("id").as("s"), lit(1000000L).as("d"))
    val tH = System.nanoTime()
    val hs = Hits.hits(sparse.unionByName(star), "s", "d", iterations = 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val topAuth = hs.where(col("kind") === "authority")
      .orderBy(col("score").desc).limit(1).head
    val sums = hs.groupBy("kind").agg(sum(col("score")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hitsSec = secs(tH)
    hs.unpersist()
    val hitsOk = topAuth.getAs[Long]("id") == 1000000L &&
      math.abs(sums("hub") - 1.0) < 1e-3 && math.abs(sums("authority") - 1.0) < 1e-3

    // ---- 3. label propagation at 2M nodes ----------------------------
    val nNodes = 2000000L
    val paths = spark.range(nNodes).where(col("id") % 10 =!= 9)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val seeds = spark.range(nNodes).where(col("id") % 10 === 0)
      .select(col("id"), concat(lit("L"), floor(col("id") / 10).cast("long") % 5).as("lbl"))
    val iters = 3
    val tL = System.nanoTime()
    val lp = LabelProp.propagate(paths, "a", "b", seeds, "id", "lbl", iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nLabeled = lp.where(col("label").isNotNull).count()
    // exact reach: offsets 0..iters within each 10-node path
    val expectLabeled = (nNodes / 10) * (iters + 1)
    val wrongLabel = lp.where(col("label").isNotNull &&
        col("label") =!= concat(lit("L"), floor(col("id") / 10).cast("long") % 5))
      .count()
    val lpSec = secs(tL)
    lp.unpersist()
    val lpOk = nLabeled == expectLabeled && wrongLabel == 0L

    // ---- 4. MP4 MJPEG decode at 10k assets ---------------------------
    val nMp4Docs = 30000L
    val mp4Docs = spark.range(nMp4Docs).select(col("id").as("doc_id"),
      lit("scaleproof seed text for the frame rasters").as("text"))
    val tM = System.nanoTime()
    val stats = Multimodal.mp4FrameStats(Multimodal.mediaMp4Videos(spark, mp4Docs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = stats.agg(
      count(lit(1)).as("n"),
      sum(when(col("decoded"), col("n_frames")).otherwise(0L)).as("frames"),
      sum(when(!col("decoded"), 1L).otherwise(0L)).as("quarantined")).head
    val mp4Sec = secs(tM)
    // exact formulas over ids ≡ 2 (mod 3): truncated iff id%5==4,
    // frames = 3 + id%5 otherwise
    val ids = (0L until nMp4Docs).filter(_ % 3 == 2)
    val expQuarantine = ids.count(_ % 5 == 4).toLong
    val expFrames = ids.filter(_ % 5 != 4).map(i => 3 + i % 5).sum
    stats.unpersist()
    val mp4Ok = agg.getLong(0) == ids.size.toLong &&
      agg.getLong(1) == expFrames && agg.getLong(2) == expQuarantine

    // ---- 5. SCD2 merge at 10M keys -----------------------------------
    val nKeys = 10000000L
    val snap1 = spark.range(nKeys).select(col("id").as("k"),
      pmod(xxhash64(col("id")), lit(100L)).as("attr"))
    val d1 = graft.etl.Scd2.initial(snap1, Seq("k"), Seq("attr"), "2026-01-01")
    val snap2 = spark.range(nKeys + 1000000L).where(col("id") % 13 =!= 0)
      .select(col("id").as("k"),
        when(col("id") % 10 === 0, lit(-1L))
          .otherwise(pmod(xxhash64(col("id")), lit(100L))).as("attr"))
    val tS = System.nanoTime()
    val d2 = graft.etl.Scd2.merge(d1, snap2, Seq("k"), Seq("attr"), "2026-02-01")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cat = d2.agg(
      count(lit(1)).as("total"),
      sum(when(col("is_current") === 1, 1L).otherwise(0L)).as("open"),
      sum(when(col("is_current") === 0, 1L).otherwise(0L)).as("closed")).head
    val scd2Sec = secs(tS)
    d2.unpersist()
    // congruence counts computed independently of Spark (a 10M-step
    // driver loop of a trivial predicate — milliseconds)
    def c(n: Long, f: Long => Boolean): Long = {
      var i = 0L; var acc = 0L
      while (i < n) { if (f(i)) acc += 1; i += 1 }
      acc
    }
    val changed = c(nKeys, i => i % 13 != 0 && i % 10 == 0)
    val missing = c(nKeys, i => i % 13 == 0)
    val newKeys = c(1000000L, i => (i + nKeys) % 13 != 0)
    val kept = nKeys - changed - missing
    val expOpen = kept + changed + newKeys
    val expClosed = changed + missing
    val scd2Ok = cat.getLong(0) == expOpen + expClosed &&
      cat.getLong(1) == expOpen && cat.getLong(2) == expClosed

    val json =
      s"""{"metric":"scaleproof_r09","t_closeness":{"rows":$nTc,"classes":$nClasses,""" +
      s""""wall_sec":${f"$tcSec%.1f"},"planted_emd":${planted.getAs[Double]("emd")},""" +
      s""""planted_top":${top.getAs[Long]("q") == 777L},"close_pass":$nClose,"ok":$tcOk},""" +
      s""""hits":{"edges":5100000,"wall_sec":${f"$hitsSec%.1f"},""" +
      s""""top_authority":${topAuth.getAs[Long]("id")},"hub_l1":${sums("hub")},"ok":$hitsOk},""" +
      s""""label_prop":{"nodes":$nNodes,"rounds":$iters,"wall_sec":${f"$lpSec%.1f"},""" +
      s""""labeled":$nLabeled,"expected":$expectLabeled,"mislabeled":$wrongLabel,"ok":$lpOk},""" +
      s""""mp4_decode":{"assets":${ids.size},"frame_decodes":$expFrames,""" +
      s""""wall_sec":${f"$mp4Sec%.1f"},"quarantined":${agg.getLong(2)},""" +
      s""""expected_quarantined":$expQuarantine,"ok":$mp4Ok},""" +
      s""""scd2":{"open_keys":$nKeys,"wall_sec":${f"$scd2Sec%.1f"},""" +
      s""""open":${cat.getLong(1)},"closed":${cat.getLong(2)},"ok":$scd2Ok}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
