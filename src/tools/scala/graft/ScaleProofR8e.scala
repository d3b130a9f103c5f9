package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{EntityResolution, FuzzyJoin}

/** Round-8e scale proof: incremental entity resolution is O(increment).
  *
  * Corpus: 2M existing names (stride-101, trailing-digit mutants as in
  * r8d — 100k of them already merged into their sources) + a 50k
  * increment (2.5% of existing): 45k fresh singleton names on a DISJOINT
  * key range and 5k mutants of existing names (planted merges).
  *
  * Measured: (1) the full resolve over 2.15M records from scratch;
  * (2) resolveIncrement against the stored index + assignments.
  * Asserted: both assignment tables are IDENTICAL (the incremental==full
  * theorem at scale), every planted increment mutant resolves into its
  * source's entity, and the incremental pass is at least 2× faster than
  * the full recompute — the ratio that turns a daily 100-TB re-resolve
  * into an increment-sized job.
  *
  * Run: `sbt "runMain graft.ScaleProofR8e /root/testdata/sf0.1 SCALEPROOF_r8e.json"`
  */
object ScaleProofR8e {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r8e.json")
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

    val nBase = 2000000L
    def baseName = format_string("name%012d", col("id") * 101L)
    val base = spark.range(nBase).select(col("id"), baseName.as("s"))
    // 100k existing mutants (of every 20th base name), X over the last
    // digit; SEQUENTIAL ids right above the base range so the increment's
    // id range stays disjoint
    val exMut = spark.range(nBase / 20)
      .select((col("id") + nBase).as("id"),
        concat(substring(format_string("name%012d", col("id") * 20L * 101L), 1, 15),
          lit("X")).as("s"))
    val existing = base.unionAll(exMut)

    // increment: 45k fresh names on a disjoint range (odd multiples of
    // 101 shifted past the base space) + 5k mutants ('Y' so they differ
    // from the existing 'X' mutants) of every 100th base name
    val incBase = nBase + nBase / 20
    val fresh = spark.range(45000L)
      .select((col("id") + incBase).as("id"),
        format_string("fresh%012d", col("id") * 101L).as("s"))
    val incMut = spark.range(5000L)
      .select((col("id") + incBase + 45000L).as("id"),
        concat(substring(format_string("name%012d", col("id") * 100L * 101L), 1, 15),
          lit("Y")).as("s"))
    val increment = fresh.unionAll(incMut).persist()
    val full = existing.unionAll(increment).persist()

    // ---- stored artifacts of the existing generation -----------------
    val tIdx = System.nanoTime()
    val existingVariants = FuzzyJoin.deletionVariants(existing, "s", "id", 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxRows = existingVariants.count()
    val indexSec = secs(tIdx)
    val existingAssign = EntityResolution.resolve(
        existing.withColumn("sc", lit(0.0)), "s", "id", "sc", t = 1)
      .select(col("id"), col("entity"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    existingAssign.count()

    // ---- 1. full recompute over 550k ---------------------------------
    val tF = System.nanoTime()
    val fullRes = EntityResolution.resolve(
        full.withColumn("sc", lit(0.0)), "s", "id", "sc", t = 1)
      .select(col("id"), col("entity"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFull = fullRes.count()
    val fullSec = secs(tF)

    // ---- 2. incremental against the stored artifacts -----------------
    val tI = System.nanoTime()
    val incRes = EntityResolution.resolveIncrement(
        existingAssign, existingVariants, increment, "s", "id", t = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nInc = incRes.count()
    val incSec = secs(tI)

    val mismatches = fullRes.withColumnRenamed("entity", "e1")
      .join(incRes.withColumnRenamed("entity", "e2"), Seq("id"), "full_outer")
      .where(not(col("e1") <=> col("e2"))).count()
    // every planted increment mutant must land in its source's entity
    val resolvedMut = incRes
      .where(col("id") >= incBase + 45000L)
      .where(col("entity") === (col("id") - (incBase + 45000L)) * 100L)
      .count()
    val ok = mismatches == 0L && nFull == nInc && nFull == 2150000L &&
      resolvedMut == 5000L && incSec * 2 < fullSec

    val json =
      s"""{"metric":"scaleproof_r8e","incremental_entity_resolution":{""" +
      s""""existing":2100000,"increment":50000,"index_rows":$idxRows,""" +
      s""""index_build_sec":${f"$indexSec%.1f"},"full_sec":${f"$fullSec%.1f"},""" +
      s""""incremental_sec":${f"$incSec%.1f"},"rows":$nFull,"mismatches":$mismatches,""" +
      s""""planted_increment_merges":5000,"resolved":$resolvedMut,"ok":$ok}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
