package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Index, Sampling}

/** Round-5 scale proof: forces the NEW operators' scale paths on inputs
  * 50-4000× the bench corpus and asserts the invariants that make each
  * path trustworthy, in one JSON artifact:
  *
  *   1. **Head-group skew quota** — an 8M-row corpus where ONE group holds
  *      half the rows. Catalyst's partial `WindowGroupLimit` pre-prunes
  *      each map task to quota rows per group, so the PLAIN formulation
  *      already survives the skew (that is the recorded finding: plain ≈
  *      salted wall time; on a planner without the rewrite the salted
  *      spelling is the fallback). Kept-set equality asserted by checksum
  *      (the salted rewrite must be a pure plan transformation,
  *      row-for-row).
  *   2. **Inverted index ×50** — replicating every document ×50 multiplies
  *      each term's doc_freq and term_freq by EXACTLY 50 (replicas are
  *      textually identical, ids fresh). Asserted over the full term
  *      table, not a sample: n_terms equal, Σdoc_freq and Σterm_freq
  *      exactly ×50.
  *   3. **k-means step ×1000** — replicating every embedding ×1000 (fresh
  *      ids, original 8 seeds keep the lowest ids) multiplies every
  *      cluster's n_members by exactly 1000 and must NOT move any
  *      centroid: the decimal-exact mean of k copies of the same multiset
  *      is the same mean. Asserted exactly (the double-sum formulation
  *      would fail this — combine-order drift).
  *   4. **Snapshot diff ×100** — 15M-key snapshots with churn planted by
  *      key arithmetic (0.1% removed, 0.1% added, ~1% changed), so the
  *      expected class counts are exact, not statistical. Asserts the
  *      diff recovers them exactly, then repeats the diff over co-bucketed
  *      warehouse snapshots and asserts the join plans with ZERO
  *      exchanges (the DiffSpec CI pin, exercised at scale) — the shape a
  *      100-TB warehouse's daily reload audit needs, where only the
  *      one-time bucketed write pays a shuffle.
  *
  * Run: `sbt "runMain graft.ScaleProofR5 /root/testdata/sf0.1 SCALEPROOF_r5.json"`
  */
object ScaleProofR5 {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r5.json")
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

    // ---- 1. head-group skew quota: 8M rows, one group = 50% ----
    val nRows = 8L * 1000 * 1000
    val skewed = spark.range(nRows).toDF("id")
      .select(col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit("head"))
          .otherwise(concat(lit("g"), pmod(col("id"), lit(1024)))).as("grp"),
        xxhash64(col("id")).as("val"))
      .localCheckpoint(true) // fixed input for both runs; excluded from timing
    val pref = Seq(col("val"), col("id"))

    val tPlain = System.nanoTime()
    val plainKept = Sampling.quotaPerGroup(skewed, "grp", 100, pref)
    val plainAgg = plainKept.agg(count(lit(1)).as("n"),
      sum(xxhash64(col("id"))).as("chk")).head
    val plainSec = secs(tPlain)

    val tSalted = System.nanoTime()
    val saltedKept = Sampling.quotaPerGroupSalted(skewed, "grp", 100, pref,
      saltKey = col("id"), salts = 64)
    val saltedAgg = saltedKept.agg(count(lit(1)).as("n"),
      sum(xxhash64(col("id"))).as("chk")).head
    val saltedSec = secs(tSalted)
    val quotaEqual = plainAgg.getLong(0) == saltedAgg.getLong(0) &&
      plainAgg.getLong(1) == saltedAgg.getLong(1)

    // ---- 2. inverted index ×50: exact df/tf scaling ----
    val docs = graft.sources.Tables(spark, sfDir).documents
    val nDocs = docs.count()
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val repIdx = 50
    val corpusIdx = docs.crossJoin(spark.range(repIdx.toLong).toDF("__r"))
      .select((col("doc_id") + col("__r") * stride).as("doc_id"), col("text"))

    val base = Index.invertedIndex(docs, "text", "doc_id", minDf = 1, maxPostings = 20)
      .agg(count(lit(1)).as("terms"), sum(col("doc_freq")).as("df"),
        sum(col("term_freq")).as("tf")).head
    val tIdx = System.nanoTime()
    val scaled = Index.invertedIndex(corpusIdx, "text", "doc_id", minDf = 1, maxPostings = 20)
      .agg(count(lit(1)).as("terms"), sum(col("doc_freq")).as("df"),
        sum(col("term_freq")).as("tf")).head
    val idxSec = secs(tIdx)
    val idxEqual = scaled.getLong(0) == base.getLong(0) &&
      scaled.getLong(1) == base.getLong(1) * repIdx &&
      scaled.getLong(2) == base.getLong(2) * repIdx

    // ---- 3. k-means step ×1000: decimal means invariant under replication ----
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val nVecs = emb.count()
    val vStride = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val repKm = 1000
    val corpusKm = emb.crossJoin(spark.range(repKm.toLong).toDF("__r"))
      .select((col("vec_id") + col("__r") * vStride).as("vec_id"), col("embedding"))

    val baseStep = Clustering.lloydStep(emb, "embedding", "vec_id", numCentroids = 8)
    val tKm = System.nanoTime()
    val scaledStep = Clustering.lloydStep(corpusKm, "embedding", "vec_id", numCentroids = 8)
      .localCheckpoint(true)
    val kmN = scaledStep.count()
    val kmSec = secs(tKm)
    // centroids must match EXACTLY; members exactly ×1000
    val scaledExpect = baseStep.select(col("cluster_id"), col("dim"),
      (col("n_members") * repKm).as("n_members"), col("centroid"))
    val kmDiff = scaledStep.exceptAll(scaledExpect).count() +
      scaledExpect.exceptAll(scaledStep).count()
    val kmEqual = kmDiff == 0

    // ---- 4. snapshot diff ×100: planted churn found exactly; bucketed
    // snapshots diff with ZERO exchanges ----
    // 15M-key snapshots built from orders ×100 with fresh keys. Churn is
    // planted by key arithmetic so expected class counts are EXACT:
    //   removed    = keys ≡ 0 (mod 1000) of the old snapshot
    //   added      = fresh keys beyond the old key space, 0.1% of base
    //   changed    = surviving keys ≡ 1 (mod 100) (price bumped)
    val orders = graft.sources.Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_totalprice"))
    val oStride = orders.agg(max(col("o_orderkey"))).head.getLong(0) + 1
    val repD = 100
    val oldSnap = orders.crossJoin(spark.range(repD.toLong).toDF("__r"))
      .select((col("o_orderkey") + col("__r") * oStride).as("k"),
        col("o_totalprice").as("v"))
    val nOld = oldSnap.count()
    val addedN = nOld / 1000
    val newSnap = oldSnap.where(pmod(col("k"), lit(1000)) =!= 0)
      .select(col("k"),
        when(pmod(col("k"), lit(100)) === 1, col("v") + 1.0).otherwise(col("v")).as("v"))
      .unionByName(spark.range(addedN).toDF("i")
        .select((col("i") + oStride * repD).as("k"), lit(1.0).as("v")))
    val expRemoved = oldSnap.where(pmod(col("k"), lit(1000)) === 0).count()
    val expChanged = oldSnap.where(pmod(col("k"), lit(1000)) =!= 0 &&
      pmod(col("k"), lit(100)) === 1).count()

    val tRaw = System.nanoTime()
    val rawCounts = graft.operators.Diff.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .groupBy(col("change")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawSec = secs(tRaw)
    val diffExact = rawCounts.getOrElse("removed", 0L) == expRemoved &&
      rawCounts.getOrElse("changed", 0L) == expChanged &&
      rawCounts.getOrElse("added", 0L) == addedN &&
      rawCounts.getOrElse("unchanged", 0L) == nOld - expRemoved - expChanged

    // bucketed path: one-time co-bucketed write, then the diff join plans
    // with no Exchange (the CI pin in DiffSpec, here at 15M keys)
    val whDir = java.nio.file.Files.createTempDirectory("graft_diff_scale").toString
    val wh = graft.etl.ParquetWarehouse(spark, whDir)
    val tWrite = System.nanoTime()
    wh.writeBucketed("sp_old", oldSnap, 64, Seq("k"), Seq("k"))
    wh.writeBucketed("sp_new", newSnap, 64, Seq("k"), Seq("k"))
    val writeSec = secs(tWrite)
    val tBuck = System.nanoTime()
    val buckDiff = graft.operators.Diff.snapshotDiff(
      wh.readTable("sp_old"), wh.readTable("sp_new"), Seq("k"), Seq("v"))
    val buckCounts = buckDiff.groupBy(col("change")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val buckSec = secs(tBuck)
    val buckNoExchange = !buckDiff.queryExecution.executedPlan.toString.contains("Exchange")
    val buckEqual = buckCounts == rawCounts
    spark.sql("DROP TABLE IF EXISTS sp_old")
    spark.sql("DROP TABLE IF EXISTS sp_new")

    val json =
      s"""{"metric":"scaleproof_r5","sf_dir":"$sfDir",
         |"quota":{"rows":$nRows,"head_share":0.5,"quota":100,"salts":64,
         |"plain_sec":${f"$plainSec%.1f"},"salted_sec":${f"$saltedSec%.1f"},
         |"kept":${plainAgg.getLong(0)},"kept_equal":$quotaEqual},
         |"inverted_index":{"docs_base":$nDocs,"replication":$repIdx,
         |"docs_scaled":${nDocs * repIdx},"wall_sec":${f"$idxSec%.1f"},
         |"n_terms":${scaled.getLong(0)},"df_tf_scale_exact":$idxEqual},
         |"kmeans":{"vecs_base":$nVecs,"replication":$repKm,
         |"vecs_scaled":${nVecs * repKm},"wall_sec":${f"$kmSec%.1f"},
         |"rows":$kmN,"centroids_invariant":$kmEqual,"diff_rows":$kmDiff},
         |"snapshot_diff":{"keys":$nOld,"removed":$expRemoved,
         |"changed":$expChanged,"added":$addedN,
         |"raw_sec":${f"$rawSec%.1f"},"bucketed_write_sec":${f"$writeSec%.1f"},
         |"bucketed_diff_sec":${f"$buckSec%.1f"},
         |"counts_exact":$diffExact,"bucketed_no_exchange":$buckNoExchange,
         |"bucketed_equal":$buckEqual}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(quotaEqual, "salted quota diverged from plain")
    require(idxEqual, "inverted index did not scale df/tf exactly")
    require(kmEqual, "k-means centroids moved under replication")
    require(diffExact, "snapshot diff missed planted churn")
    require(buckNoExchange, "bucketed snapshot diff planned an Exchange")
    require(buckEqual, "bucketed diff counts diverged from raw")
    Sessions.release(spark, owned)
  }
}
