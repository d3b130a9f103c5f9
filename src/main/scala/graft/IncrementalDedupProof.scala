package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Quantifies the stored-index incremental dedup story (q72 at scale):
  * a corpus's LSH band index is built ONCE and persisted; each daily
  * increment signs only its own documents and equi-joins the stored
  * index. This harness measures, on a replicated corpus:
  *
  *   A. one-time index build + parquet write over the corpus;
  *   B. the daily path — sign the increment, join the STORED index
  *      (read back from parquet, as a real warehouse would);
  *   C. the naive baseline — full-corpus candidate generation from raw
  *      text, as if no index existed;
  *
  * and checks B's pairs equal C's restricted to increment-touching pairs.
  * The headline is C/B — how much of the daily cost the index removes;
  * it grows with corpus/increment ratio (here 9:1).
  *
  * Run: `sbt "runMain graft.IncrementalDedupProof /root/testdata/sf0.1 10 INCPROOF_r3.json"`
  */
object IncrementalDedupProof {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replication = args.lift(1).map(_.toInt).getOrElse(10)
    val outPath = args.lift(2).getOrElse("INCPROOF_r3.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 4 * cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s"))
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val docs = graft.sources.Tables(spark, sfDir).documents
    val idStride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val all = docs
      .crossJoin(spark.range(replication.toLong).toDF("__r"))
      .select((col("doc_id") + col("__r") * idStride).as("doc_id"), col("text"))
    // 9:1 split — the corpus is every replica but the last, the increment
    // is the last replica (today's batch, near-dup-heavy against history)
    val corpus = all.where(col("doc_id") < (replication - 1).toLong * idStride)
    val increment = all.where(col("doc_id") >= (replication - 1).toLong * idStride)
    val nCorpus = corpus.count(); val nInc = increment.count()

    val indexPath = java.nio.file.Files.createTempDirectory("lsh-index").toString
    // A: one-time index build + persist
    val tA = System.nanoTime()
    Dedup.minhashBandIndexMd5(corpus, "text", "doc_id")
      .write.mode("overwrite").parquet(indexPath)
    val buildSec = secs(tA)

    // B: daily path — increment signed alone, stored index joined
    val tB = System.nanoTime()
    val incPairs = Dedup.incrementalCandidatePairsMd5(
      increment, spark.read.parquet(indexPath), "text", "doc_id")
    val nIncPairs = incPairs.count()
    val incSec = secs(tB)

    // C: naive baseline — full corpus re-signed from raw text
    val tC = System.nanoTime()
    val fullPairs = Dedup.minhashCandidatePairsMd5(all, "text", "doc_id")
    val nFullPairs = fullPairs.count()
    val fullSec = secs(tC)

    // equality: B == C restricted to pairs touching the increment
    val cut = (replication - 1).toLong * idStride
    val restricted = fullPairs.where(col("id_a") >= cut || col("id_b") >= cut)
    val diffs = incPairs.exceptAll(restricted).count() +
      restricted.exceptAll(incPairs).count()

    val json =
      s"""{"metric":"incproof","sf_dir":"$sfDir","replication":$replication,
         |"n_corpus":$nCorpus,"n_increment":$nInc,
         |"index_build_sec":${f"$buildSec%.1f"},"incremental_sec":${f"$incSec%.1f"},
         |"full_rescan_sec":${f"$fullSec%.1f"},"speedup":${f"${fullSec / incSec}%.1f"},
         |"n_incremental_pairs":$nIncPairs,"n_full_pairs":$nFullPairs,
         |"pairs_equal_restricted":${diffs == 0},"pair_diff_rows":$diffs}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(diffs == 0, "incremental pairs disagree with restricted full pairs")
    Sessions.release(spark, owned)
  }
}
