package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{GraphStats, Profile, TextAnalysis}

/** Round-9b scale proof: the text/statistics newcomers at 100-TB-shaped
  * sizes, every assertion exact by construction.
  *
  * 1. PMI at 10M tokens (1M docs): a planted always-adjacent pair must
  *    take the top PMI slot with its exact pair count.
  * 2. Collocation merge at 1M docs: exactly one merge per doc, the
  *    rewritten corpus starts with the fused token.
  * 3. k-core at 5M+ edges: a 1000-node degree-6 circulant core survives
  *    k=4 peeling exactly while 5M pendant edges strip in round one.
  * 4. Robust scale at 10M rows: exactly the 1000 planted outliers flag.
  * 5. Assortativity at 5M star-forest edges: r = −1 exactly (every edge
  *    joins a degree-10 hub to a degree-1 leaf).
  *
  * Run: `sbt "runMain graft.ScaleProofR9b unused SCALEPROOF_r09b.json"`
  */
object ScaleProofR9b {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r09b.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true"))
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- 1+2. PMI + collocation merge at 1M docs / 10M tokens --------
    val nDocs = 1000000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat(lit("pa pb"),
        lit(" w"), pmod(xxhash64(col("id"), lit(1)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(2)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(3)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(4)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(5)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(6)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(7)), lit(50000L)),
        lit(" w"), pmod(xxhash64(col("id"), lit(8)), lit(50000L))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val tP = System.nanoTime()
    val topPmi = TextAnalysis.pmiCooccurrence(docs, "text", "doc_id",
        window = 2, minPairCount = 1000)
      .orderBy(col("pmi").desc, col("term_a"), col("term_b")).limit(1).head
    val pmiSec = secs(tP)
    val pmiOk = topPmi.getString(0) == "pa" && topPmi.getString(1) == "pb" &&
      topPmi.getLong(2) == nDocs // "pa pb" adjacent once per doc, window 2 adds no repeat
    val tC = System.nanoTime()
    val merged = TextAnalysis.mergeCollocations(docs, "text", "doc_id",
      minPairCount = 1000, minPmi = 1.0)
    val mAgg = merged.agg(sum(col("n_merged")).as("nm"),
      sum(when(col("text").startsWith("pa_pb "), 1L).otherwise(0L)).as("fused")).head
    val colSec = secs(tC)
    // every doc merges (pa,pb); hash-noise pairs can also clear the gates
    // in principle, but planted-pair dominance is what we assert exactly
    val colOk = mAgg.getLong(1) == nDocs
    docs.unpersist()

    // ---- 3. k-core at 5M+ edges --------------------------------------
    val coreN = 1000L
    val circulant = spark.range(coreN).select(col("id").as("a"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("__o"))
      .select(col("a"), pmod(col("a") + col("__o"), lit(coreN)).as("b"))
    val pendants = spark.range(5000000L).select(
      pmod(col("id"), lit(coreN)).as("a"), (col("id") + 10000L).as("b"))
    val tK = System.nanoTime()
    val core = GraphStats.kCorePeel(circulant.unionByName(pendants), "a", "b",
      k = 4, rounds = 3)
    val kAgg = core.agg(count(lit(1)).as("n"),
      sum(when(col("degree") === 6, 1L).otherwise(0L)).as("d6"),
      min(col("converged")).as("conv")).head
    val kSec = secs(tK)
    val kOk = kAgg.getLong(0) == coreN && kAgg.getLong(1) == coreN &&
      kAgg.getLong(2) == 1L

    // ---- 4. robust scale at 10M rows ---------------------------------
    val nR = 10000000L
    val rows = spark.range(nR).select(col("id"),
      when(col("id") < 1000, lit(1.0e9))
        .otherwise(pmod(xxhash64(col("id")), lit(1000L)).cast("double")).as("v"))
    val tR = System.nanoTime()
    val scaled = Profile.robustScale(rows, "id", "v", fence = 10.0)
    val rAgg = scaled.agg(sum(col("outlier")).as("flags"),
      count(lit(1)).as("n")).head
    val rSec = secs(tR)
    val rOk = rAgg.getLong(0) == 1000L && rAgg.getLong(1) == nR

    // ---- 5. assortativity at 5M star-forest edges --------------------
    val stars = spark.range(5000000L).select(
      pmod(col("id"), lit(500000L)).as("a"), (col("id") + 1000000L).as("b"))
    val tA = System.nanoTime()
    val ar = GraphStats.assortativity(stars, "a", "b").head
    val aSec = secs(tA)
    val aOk = ar.getDouble(2) == -1.0 && ar.getLong(1) == 5000000L

    val json =
      s"""{"metric":"scaleproof_r09b","pmi":{"docs":$nDocs,"tokens":${nDocs * 10},""" +
      s""""wall_sec":${f"$pmiSec%.1f"},"top_pair":"${topPmi.getString(0)}_${topPmi.getString(1)}",""" +
      s""""top_count":${topPmi.getLong(2)},"ok":$pmiOk},""" +
      s""""collocation_merge":{"docs":$nDocs,"wall_sec":${f"$colSec%.1f"},""" +
      s""""merged_docs":${mAgg.getLong(1)},"total_merges":${mAgg.getLong(0)},"ok":$colOk},""" +
      s""""kcore":{"edges":5003000,"wall_sec":${f"$kSec%.1f"},"survivors":${kAgg.getLong(0)},""" +
      s""""degree6":${kAgg.getLong(1)},"converged":${kAgg.getLong(2)},"ok":$kOk},""" +
      s""""robust_scale":{"rows":$nR,"wall_sec":${f"$rSec%.1f"},"flags":${rAgg.getLong(0)},"ok":$rOk},""" +
      s""""assortativity":{"edges":5000000,"wall_sec":${f"$aSec%.1f"},""" +
      s""""r":${ar.getDouble(2)},"ok":$aOk}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
