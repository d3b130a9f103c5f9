package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Round-8c scale proof: the PCA production twin at real scale.
  *
  * SCALEPROOF_r8b timed the ORACLE-doctrine fit (DECIMAL(28,9)
  * accumulation) at 2M×64 in ~990s — the deliberate price of bit-exact
  * replayability, dominated by BigDecimal adds. This proof runs the
  * `exact = false` production twin (native double sums, same plan
  * shape):
  *
  * 1. 8M×64 vectors (4× the r8b corpus), planted dominant axis —
  *    recovered at |loading| > 0.999, explained_ratio > 0.99, and the
  *    fit must land in a SMALL fraction of the decimal path's wall
  *    (the speedup factor is recorded).
  * 2. Fast-vs-exact agreement at 200k: every loading and mean within
  *    1e-6 of the decimal trajectory — the twin is the same estimator,
  *    just without the replay contract.
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

    // ---- 2. fast == exact (to 1e-6) at 200k -------------------------
    val small = synth(200000L)
    val ex = Pca.topComponent(small, "embedding", 64).collect().sortBy(_.getLong(0))
    val fa = Pca.topComponent(small, "embedding", 64, exact = false)
      .collect().sortBy(_.getLong(0))
    val maxDelta = ex.zip(fa).map { case (e, f) =>
      math.abs(e.getAs[Double]("loading") - f.getAs[Double]("loading")) }.max
    val agreeOk = maxDelta < 1e-6

    val r8bDecimalSec = 990.7 // SCALEPROOF_r8b.json, 2M exact fit
    val json =
      s"""{"metric":"scaleproof_r8c","sf_dir":"$sfDir",
         |"pca_fast":{"vectors":$nBig,"dim":64,"iters":3,
         |"wall_sec":${f"$fastSec%.1f"},"planted_axis_loading":${f"$load7%.6f"},
         |"explained_ratio":${f"$ratio%.6f"},
         |"decimal_path_wall_sec_at_2m":$r8bDecimalSec,"ok":$fastOk},
         |"fast_vs_exact":{"vectors":200000,"max_loading_delta":$maxDelta,
         |"ok":$agreeOk}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(fastOk, s"fast PCA failed: load7=$load7 ratio=$ratio")
    require(agreeOk, s"fast/exact disagreement: $maxDelta")
    Sessions.release(spark, owned)
  }
}
