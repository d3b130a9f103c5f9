package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Multimodal, RankEval, Rerank, Sampling, Similarity}

/** Round-6 scale proof, part 2: the q109–q113 operators and the real
  * PNG/JPEG decode path, forced onto 8–256× the bench data with EXACT
  * structural invariants (never statistical ones). One JSON artifact.
  *
  * Replication factors are POWERS OF TWO wherever a decimal-sum → double
  * division must stay bit-exact: scaling a real by 2^k commutes with
  * round-to-nearest-double, so fl(2^k·S)/(2^k·c) is the SAME double as
  * fl(S)/c — replicated means equal base means exactly, with no rounding
  * tolerance anywhere.
  *
  *   1. **Hard negatives ×256** (q109) — replicating every vector ×256
  *      (fresh ids, labels kept) makes each base negative a 256-member
  *      family with IDENTICAL cosine; the scaled top-(5·256) per anchor
  *      must be EXACTLY the base top-5 as complete 256-families (partial
  *      families would mean replica-dependent scores). An anchor's own
  *      replicas carry its label and must be invisible to the label
  *      filter. The sign-plane bucketed form is timed on the same 512k
  *      corpus and must keep dense ranks and the different-label contract.
  *   2. **Prototype eval ×256** (q110) — labels ride the replicas, so the
  *      per-label decimal means are bit-equal to base (power-of-two
  *      argument) and every confusion cell must count EXACTLY 256× its
  *      base value.
  *   3. **MMR ×8 query replication** (q112) — the greedy is a pure
  *      function of the candidate list; all 8 replicas of a base query
  *      (same vector, fresh ids, so identical candidate lists) must
  *      produce the IDENTICAL pick sequence, for all 16k queries, while
  *      the one query_id shuffle + row-local greedy handles 16k×10
  *      candidate rows.
  *   4. **Rank eval ×8 query replication** (q113) — recall@5 / MRR /
  *      overlap must agree exactly across all replicas of each base
  *      query (both rankings are functions of the vector).
  *   5. **Split manifest ×50** (q111) — the manifest over 250k docs is
  *      identical under different input partitioning, and the r=0 replica
  *      rows keep their base split (assignment is a pure function of the
  *      id, blind to corpus contents).
  *   6. **Media decode ×10** (real codecs) — 50k synthesized assets
  *      through mapPartitions decode: every image row must carry the
  *      real-raster marker (PPM and PNG kernels both), every audio row
  *      the real-WAV marker, every video row the real-MP4-demux marker
  *      (the ISO BMFF box walk); counts derived from the id partitioning,
  *      wall time recorded.
  *
  * Run: `sbt "runMain graft.ScaleProofR6b /root/testdata/sf0.1 SCALEPROOF_r6b.json"`
  */
object ScaleProofR6b {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r6b.json")
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

    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val nVecs = emb.count()
    val vStride = emb.agg(max(col("vec_id"))).head.getLong(0) + 1

    // ---- 1. hard negatives ×256: complete equal-cosine families ----
    val rep = 256
    val embScaled = emb.crossJoin(spark.range(rep.toLong).toDF("__r"))
      .select((col("vec_id") + col("__r") * vStride).as("vec_id"),
        col("embedding"), col("label"))
      .localCheckpoint(true)
    val anchors = emb.where(pmod(col("vec_id"), lit(50)) === 0)
    val baseNeg = Similarity.hardNegativesTopK(anchors, emb, "embedding", "vec_id",
        "label", k = 5)
      .select(col("anchor_id"), col("negative_id").as("__fam"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tHn = System.nanoTime()
    val scaledNeg = Similarity.hardNegativesTopK(anchors, embScaled, "embedding",
      "vec_id", "label", k = 5 * rep)
    val famRows = scaledNeg
      .groupBy(col("anchor_id"), pmod(col("negative_id"), lit(vStride)).as("__fam"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val hnSec = secs(tHn)
    val hnComplete = famRows.forall(_.getAs[Long]("n") == rep.toLong) &&
      famRows.map(r => (r.getLong(0), r.getLong(1))).toSet == baseNeg
    val tHnLsh = System.nanoTime()
    val lshNeg = Similarity.hardNegativesLsh(anchors, embScaled, "embedding",
      "vec_id", "label", k = 5, planes = 8, dim = 64).collect()
    val hnLshSec = secs(tHnLsh)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hnLshOk = lshNeg.nonEmpty &&
      lshNeg.forall(r => r.getAs[Int]("negative_label") != labelOf(r.getAs[Long]("anchor_id"))) &&
      lshNeg.groupBy(_.getAs[Long]("anchor_id")).values
        .forall(rs => rs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rs.length))

    // ---- 2. prototype eval ×256: cells exactly ×256, prototypes bit-equal ----
    val baseProto = Clustering.labelPrototypes(emb, "embedding", "label")
      .localCheckpoint(true)
    val tPr = System.nanoTime()
    val scaledProto = Clustering.labelPrototypes(embScaled, "embedding", "label")
      .localCheckpoint(true)
    val protoDiff = scaledProto.exceptAll(baseProto).count() +
      baseProto.exceptAll(scaledProto).count()
    val scaledConf = Clustering.nearestPrototypeConfusion(embScaled,
        "embedding", "vec_id", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    val prSec = secs(tPr)
    val baseConf = Clustering.nearestPrototypeConfusion(emb,
        "embedding", "vec_id", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    val prOk = protoDiff == 0 && scaledConf.size == baseConf.size &&
      baseConf.forall { case (cell, n) => scaledConf.get(cell).contains(n * rep) }

    // ---- 3. MMR ×8 query replication: all replicas of a base query must
    // pick identically. Replicas start at r=1 (fresh ids only): the base
    // id would exclude ITSELF from the corpus by id while its replicas
    // would not, so base and replica candidate lists legitimately differ
    // by the cos=1 self row — replicas, by contrast, all see the exact
    // same list and any divergence is a real greedy instability. ----
    val qRep = 8
    val queriesScaled = emb.crossJoin(spark.range(1L, qRep.toLong + 1).toDF("__r"))
      .select((col("vec_id") + col("__r") * vStride).as("vec_id"),
        col("embedding"), col("label"))
    val tMmr = System.nanoTime()
    val mmrScaled = Rerank.mmrDiversifyTopK(queriesScaled, emb, "embedding", "vec_id",
        m = 10, k = 3, lambda = 0.5)
      .select(pmod(col("query_id"), lit(vStride)).as("__bq"),
        col("mmr_rank"), col("neighbor_id"))
    val mmrRows = mmrScaled.count()
    val mmrSec = secs(tMmr)
    val mmrGroups = mmrScaled
      .groupBy(col("__bq"), col("mmr_rank"))
      .agg(countDistinct(col("neighbor_id")).as("nd"), count(lit(1)).as("n"))
      .collect()
    val mmrOk = mmrRows == nVecs * qRep * 3 &&
      mmrGroups.forall(r => r.getAs[Long]("nd") == 1L && r.getAs[Long]("n") == qRep.toLong)

    // ---- 4. rank eval ×8 query replication: replicas agree exactly ----
    val tRe = System.nanoTime()
    val exactScaled = Similarity.bruteForceTopK(queriesScaled, emb, "embedding", "vec_id", 5)
    val approxScaled = Similarity.lshTopKDet(queriesScaled, emb, "embedding", "vec_id",
      k = 5, planes = 6, dim = 64)
    val evalScaled = RankEval.vsExact(approxScaled, exactScaled,
        "query_id", "rank", "neighbor_id")
      .select(pmod(col("query_id"), lit(vStride)).as("__bq"),
        col("n_exact"), col("n_overlap"), col("recall_at_k"), col("rr"))
    val evalRows = evalScaled.count()
    val reSec = secs(tRe)
    val evalGroups = evalScaled
      .groupBy(col("__bq"))
      .agg(countDistinct(col("n_exact"), col("n_overlap"),
        col("recall_at_k"), col("rr")).as("nd"), count(lit(1)).as("n"))
      .collect()
    val reOk = evalRows == nVecs * qRep &&
      evalGroups.forall(r => r.getAs[Long]("nd") == 1L && r.getAs[Long]("n") == qRep.toLong)

    // ---- 5. split manifest ×50: partition-invariant, id-pure ----
    val docs = graft.sources.Tables(spark, sfDir).documents
    val nDocs = docs.count()
    val dStride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val dRep = 50
    val docsScaled = docs.crossJoin(spark.range(dRep.toLong).toDF("__r"))
      .select((col("doc_id") + col("__r") * dStride).as("doc_id"),
        col("text"), col("source"), col("n_chars"))
      .localCheckpoint(true)
    val splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    def manifest(df: DataFrame): DataFrame =
      Sampling.assignSplits(df, "doc_id", splits)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
    val tSp = System.nanoTime()
    val m1 = manifest(docsScaled).collect()
    val spSec = secs(tSp)
    val m2 = manifest(docsScaled.repartition(97)).collect()
    val spInvariant = m1.map(_.toString).sorted.sameElements(m2.map(_.toString).sorted)
    val baseAssign = Sampling.assignSplits(docs, "doc_id", splits)
      .select(col("doc_id"), col("split").as("__bs"))
    val idPure = Sampling.assignSplits(docsScaled.where(col("doc_id") < dStride),
        "doc_id", splits)
      .join(baseAssign, Seq("doc_id"))
      .where(col("split") =!= col("__bs")).count() == 0

    // ---- 6. media decode ×10: 50k assets through the REAL codecs ----
    val mRep = 10
    val docsMedia = docs.crossJoin(spark.range(mRep.toLong).toDF("__r"))
      .select((col("doc_id") + col("__r") * dStride).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val tMd = System.nanoTime()
    val assets = Multimodal.mediaRealAssets(spark, docsMedia)
    val feats = Multimodal.extractFeatures(assets)
      .select(col("media_id"), col("modality"), col("feature")(0).as("__marker"))
      .localCheckpoint(true)
    val nAssets = feats.count()
    val mdSec = secs(tMd)
    val markerCounts = feats
      .groupBy(col("modality"), col("__marker")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getFloat(1)) -> r.getAs[Long]("n")).toMap
    val imgReal = markerCounts.collect { case (("image", m), n) if m == 2.0f => n }.sum
    val audReal = markerCounts.collect { case (("audio", m), n) if m == 1.0f => n }.sum
    val imgAll = markerCounts.collect { case (("image", _), n) => n }.sum
    val audAll = markerCounts.collect { case (("audio", _), n) => n }.sum
    val vidReal = markerCounts.collect {
      case (("video", m), n) if m == 3.0f => n }.sum
    val vidAll = markerCounts.collect { case (("video", _), n) => n }.sum
    val mdOk = nAssets == nDocs * mRep && imgReal == imgAll && audReal == audAll &&
      vidReal == vidAll && imgAll > 0 && audAll > 0 && vidAll > 0

    val json =
      s"""{"metric":"scaleproof_r6b","sf_dir":"$sfDir",
         |"hard_negatives":{"vecs_base":$nVecs,"replication":$rep,
         |"vecs_scaled":${nVecs * rep},"wall_sec":${f"$hnSec%.1f"},
         |"complete_families":$hnComplete,
         |"lsh_form_sec":${f"$hnLshSec%.1f"},"lsh_contract":$hnLshOk},
         |"prototype_eval":{"vecs_scaled":${nVecs * rep},
         |"wall_sec":${f"$prSec%.1f"},"prototypes_bit_equal":${protoDiff == 0},
         |"cells_exact_x${rep}":$prOk},
         |"mmr":{"queries_scaled":${nVecs * qRep},"wall_sec":${f"$mmrSec%.1f"},
         |"replica_picks_identical":$mmrOk},
         |"rank_eval":{"queries_scaled":${nVecs * qRep},"wall_sec":${f"$reSec%.1f"},
         |"replica_metrics_identical":$reOk},
         |"split_manifest":{"docs_scaled":${nDocs * dRep},"wall_sec":${f"$spSec%.1f"},
         |"partition_invariant":$spInvariant,"id_pure":$idPure},
         |"media_decode":{"assets":$nAssets,"wall_sec":${f"$mdSec%.1f"},
         |"images_real_decode":$imgReal,"audio_real_decode":$audReal,
         |"video_real_demux":$vidReal,"all_markers_correct":$mdOk}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(hnComplete, "hard negatives: scaled top-k is not complete replica families")
    require(hnLshOk, "hard negatives LSH form broke its contract at scale")
    require(prOk, "prototype eval not exactly replication-invariant")
    require(mmrOk, "MMR replica picks diverged")
    require(reOk, "rank-eval replica metrics diverged")
    require(spInvariant && idPure, "split manifest not partition-invariant/id-pure")
    require(mdOk, "media decode markers wrong at scale")
    Sessions.release(spark, owned)
  }
}
