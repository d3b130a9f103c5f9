package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dbscan, Dedup, WordPiece}

/** Round-14 scale proof: the r14 newcomers at 100-TB-shaped sizes, every
  * assertion exact by construction.
  *
  * 1. Bucketed DBSCAN (the q190 path) at 2.02M vectors / 20 sign planes:
  *    200 planted clusters of 100 same-direction members (cluster mass in
  *    dims 0..30) sit in a sea of 2M noise vectors (mass in dims 32..63 —
  *    cluster×noise cosine is EXACTLY 0, so noise can never bleed into a
  *    planted cluster). Every planted member must come back role=core
  *    with cluster = its block's min id, 20,000/20,000 exactly; bucket
  *    fan-out stays sane because same-direction members share their
  *    20-plane bucket BY CONSTRUCTION while 2M noise vectors spread over
  *    2^20 buckets.
  * 2. Incremental DBSCAN (the q193 path): +101k arrivals (1k joining 100
  *    existing clusters as NEW same-direction members + 100k fresh
  *    noise). The increment probes the STORED bucket index only
  *    (stored×stored never recomputes); the report must equal the full
  *    recompute ROW FOR ROW at 2.12M rows (except() both ways), and the
  *    increment's pair-generation wall time is recorded against the full
  *    rebuild's.
  * 3. WordPiece maximal-munch encode at 1M docs / 5M distinct words
  *    (vocab 512 induced from the corpus itself): greedy fallback makes
  *    the encoding LOSSLESS — per document, the piece stream stripped of
  *    separators must reassemble to exactly the document's characters;
  *    asserted as zero mismatching documents, plus exact piece
  *    accounting (n_pieces >= n_words, n_oov <= n_pieces).
  *
  * Run: `sbt "runMain graft.ScaleProofR14 unused SCALEPROOF_r14.json"`
  */
object ScaleProofR14 {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r14.json")
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

    val dim = 64
    val planes = 20
    val nClusters = 200L
    val perCluster = 100L
    val nPlanted = nClusters * perCluster // ids [0, 20k)
    val nNoise = 2000000L                 // ids [1M, 3M)

    // planted member: direction keyed by its cluster in dims 0..30 (all
    // members of a cluster share the EXACT direction — magnitudes vary,
    // cosine stays ~1.0); noise: pseudo-random values in dims 32..63
    // only, so cluster×noise cosine is exactly 0. Components are ODD
    // integers over an ODD dim count (31): every sign-plane dot of a
    // cluster direction is an odd integer scaled by the member factor —
    // |dot| >= factor, bounded away from 0, so float rounding can never
    // flip a bucket bit between two members of one cluster.
    def clusterVec(idCol: org.apache.spark.sql.Column) = {
      val c = (idCol / lit(perCluster)).cast("long")
      transform(sequence(lit(0), lit(dim - 1)), j =>
        when(j < 31,
          (pmod(xxhash64(c, j), lit(10L)) * 2L - 9L).cast("float") *
            (lit(1.0f) + (pmod(idCol, lit(perCluster))).cast("float") / lit(200.0f)))
          .otherwise(lit(0.0f)))
    }
    def noiseVec(idCol: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)), j =>
        when(j >= 32, (pmod(xxhash64(idCol, j), lit(19L)) - 9L).cast("float"))
          .otherwise(lit(0.0f)))

    val planted = spark.range(nPlanted).select(col("id").as("vec_id"),
      clusterVec(col("id")).as("embedding"))
    val noise = spark.range(nNoise).select((col("id") + 1000000L).as("vec_id"),
      noiseVec(col("id") + 1000000L).as("embedding"))
    val corpus = planted.unionByName(noise)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCorpus = corpus.count()

    // ---- 1. bucketed DBSCAN at 2.02M vectors -------------------------
    val t1 = System.nanoTime()
    val pairs = Dedup.embeddingNearDupsDet(corpus, "embedding", "vec_id",
      threshold = 0.9, planes = planes, dim = dim)
    val clustered = Dbscan.fromPairs(corpus, "vec_id", pairs, "id_a", "id_b",
        minPts = 10)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pAgg = clustered.where(col("vid") < nPlanted)
      .agg(count(lit(1)).as("n"),
        sum(when(col("role") === "core" &&
          col("cluster") === (col("vid") / lit(perCluster)).cast("long") * lit(perCluster),
          1L).otherwise(0L)).as("exact")).head
    val dbscanSec = secs(t1)
    val dbscanOk = pAgg.getLong(0) == nPlanted && pAgg.getLong(1) == nPlanted

    // ---- 2. incremental vs full at +101k arrivals --------------------
    // 1k joiners = 10 new same-direction members per cluster 0..99:
    // ids [5M, 5M+1k) join cluster (id % 100); plus 100k fresh noise
    val joiners = spark.range(1000L).select((col("id") + 5000000L).as("vec_id"),
      clusterVec(pmod(col("id"), lit(100L)) * lit(perCluster)).as("embedding"))
    val incNoise = spark.range(100000L).select((col("id") + 6000000L).as("vec_id"),
      noiseVec(col("id") + 6000000L).as("embedding"))
    val inc = joiners.unionByName(incNoise).persist(StorageLevel.MEMORY_AND_DISK)
    inc.count()
    val all = corpus.unionByName(inc).persist(StorageLevel.MEMORY_AND_DISK)
    all.count()

    val tIdx = System.nanoTime()
    val storedIndex = Dedup.signPlaneIndex(corpus, "embedding", "vec_id", planes, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    storedIndex.count()
    val storedEdges = Dedup.embeddingNearDupsDet(corpus, "embedding", "vec_id",
        threshold = 0.9, planes = planes, dim = dim)
      .select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nStoredEdges = storedEdges.count()
    val storedPrepSec = secs(tIdx)

    val tInc = System.nanoTime()
    val newEdges = Dedup.embeddingNearDupsDetIncrement(storedIndex, inc,
        "embedding", "vec_id", threshold = 0.9, planes = planes, dim = dim)
      .select(col("id_a"), col("id_b"))
    val incResult = Dbscan.fromPairs(all, "vec_id",
        storedEdges.unionByName(newEdges), "id_a", "id_b", minPts = 10)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nIncRows = incResult.count()
    val incSec = secs(tInc)

    val tFull = System.nanoTime()
    val fullPairs = Dedup.embeddingNearDupsDet(all, "embedding", "vec_id",
      threshold = 0.9, planes = planes, dim = dim)
    val fullResult = Dbscan.fromPairs(all, "vec_id", fullPairs, "id_a", "id_b",
        minPts = 10)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nFullRows = fullResult.count()
    val fullSec = secs(tFull)
    val mismatches = incResult.exceptAll(fullResult).count() +
      fullResult.exceptAll(incResult).count()
    val joinerAgg = incResult
      .where(col("vid") >= 5000000L && col("vid") < 5001000L)
      .agg(sum(when(col("role") === "core" &&
        col("cluster") === pmod(col("vid") - 5000000L, lit(100L)) * lit(perCluster),
        1L).otherwise(0L)).as("exact")).head
    val incOk = mismatches == 0L && nIncRows == nFullRows &&
      joinerAgg.getLong(0) == 1000L

    corpus.unpersist(); clustered.unpersist(); storedIndex.unpersist()
    storedEdges.unpersist(); incResult.unpersist(); fullResult.unpersist()
    inc.unpersist(); all.unpersist()

    // ---- 3. WordPiece encode at 1M docs / 5M distinct words ----------
    val nDocs = 1000000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("w"), pmod(xxhash64(col("id"), lit(1)), lit(5000000L))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(2)), lit(5000000L))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(3)), lit(5000000L))),
        concat(lit("common"), pmod(col("id"), lit(100L))),
        concat(lit("w"), pmod(xxhash64(col("id"), lit(4)), lit(5000000L)))).as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val tV = System.nanoTime()
    val vocab = WordPiece.induceVocab(docs, "text", maxPieceLen = 5, vocabSize = 512)
      .orderBy("rank").select("piece").collect().map(_.getString(0)).toSeq
    val vocabSec = secs(tV)
    val tE = System.nanoTime()
    val enc = WordPiece.encode(docs, "text", "doc_id", vocab, maxPieceLen = 5)
    // lossless: pieces minus separators == original text minus separators
    val eAgg = enc.join(docs, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(regexp_replace(col("pieces"), " ", "") ===
          regexp_replace(col("text"), " ", ""), 0L).otherwise(1L)).as("bad"),
        sum(when(col("n_pieces") >= 5L && col("n_oov") <= col("n_pieces"), 0L)
          .otherwise(1L)).as("acct")).head
    val encSec = secs(tE)
    val wpOk = eAgg.getLong(0) == nDocs && eAgg.getLong(1) == 0L &&
      eAgg.getLong(2) == 0L
    docs.unpersist()

    val json =
      s"""{"metric":"scaleproof_r14","dbscan_bucketed":{"vectors":$nCorpus,""" +
      s""""planes":$planes,"planted":$nPlanted,"exact_core":${pAgg.getLong(1)},""" +
      s""""wall_sec":${f"$dbscanSec%.1f"},"ok":$dbscanOk},""" +
      s""""dbscan_incremental":{"stored":$nCorpus,"increment":101000,""" +
      s""""stored_edges":$nStoredEdges,"stored_prep_sec":${f"$storedPrepSec%.1f"},""" +
      s""""incremental_sec":${f"$incSec%.1f"},"full_sec":${f"$fullSec%.1f"},""" +
      s""""rows":$nIncRows,"mismatches":$mismatches,""" +
      s""""joiners_exact":${joinerAgg.getLong(0)},"ok":$incOk},""" +
      s""""wordpiece_encode":{"docs":$nDocs,"distinct_words_approx":5000000,""" +
      s""""vocab":512,"vocab_sec":${f"$vocabSec%.1f"},"encode_sec":${f"$encSec%.1f"},""" +
      s""""lossless_failures":${eAgg.getLong(1)},"ok":$wpOk}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
