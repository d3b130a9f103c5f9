package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PageRank}

/** Round-6 scale proof, part 3: PageRank (q116/q117) under DISJOINT graph
  * replication. Replicating the near-dup candidate graph ×N with id
  * offsets produces N isomorphic components that never interact, so every
  * copy's rank vector must equal the base graph's EXACTLY — the decimal-
  * quantized contributions make per-copy arithmetic identical regardless
  * of how Spark partitions the union. Asserted for every vertex of every
  * copy (countDistinct(rank) per base vertex == 1, and that rank == the
  * base run's). Wall time covers 3 iterations over the scaled edge list —
  * the per-iteration shuffle is edge-bounded, which is the property that
  * holds at 100 TB.
  *
  * Run: `sbt "runMain graft.ScaleProofR6c /root/testdata/sf0.1 SCALEPROOF_r6c.json"`
  */
object ScaleProofR6c {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r6c.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 4 * cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val docs = graft.sources.Tables(spark, sfDir).documents
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val cand = Dedup.minhashCandidatePairsMd5(docs, "text", "doc_id",
      numHashes = 64, bands = 16).localCheckpoint(true)
    val nPairs = cand.count()
    val rep = math.max(1L, 2000000L / math.max(nPairs, 1L))
    val scaledEdges = cand.crossJoin(spark.range(rep).toDF("__r"))
      .select((col("id_a") + col("__r") * stride).as("id_a"),
        (col("id_b") + col("__r") * stride).as("id_b"))
      .localCheckpoint(true)
    val nEdges = scaledEdges.count()

    val basePr = PageRank.pageRank(cand, "id_a", "id_b", iterations = 3)
      .select(col("id").as("__bid"), col("rank").as("__base_rank"))
      .localCheckpoint(true)
    val nBaseVerts = basePr.count()

    val t0 = System.nanoTime()
    val scaledPr = PageRank.pageRank(scaledEdges, "id_a", "id_b", iterations = 3)
    val nScaledVerts = scaledPr.count()
    val prSec = secs(t0)

    val perBase = scaledPr
      .groupBy(pmod(col("id"), lit(stride)).as("__bid"))
      .agg(countDistinct(col("rank")).as("nd"), count(lit(1)).as("n"),
        first(col("rank")).as("r"))
    val mismatches = perBase.join(basePr, Seq("__bid"))
      .where(col("nd") =!= 1 || col("n") =!= rep || col("r") =!= col("__base_rank"))
      .count()
    val ok = mismatches == 0 && nScaledVerts == nBaseVerts * rep

    val json =
      s"""{"metric":"scaleproof_r6c","sf_dir":"$sfDir",
         |"pagerank":{"base_pairs":$nPairs,"replication":$rep,
         |"edges_scaled":${nEdges * 2},"vertices_scaled":$nScaledVerts,
         |"iterations":3,"wall_sec":${f"$prSec%.1f"},
         |"per_copy_ranks_exact":$ok,"mismatches":$mismatches}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(ok, "PageRank per-copy ranks diverged under disjoint replication")
    Sessions.release(spark, owned)
  }
}
