package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.ManifestWarehouse
import graft.operators.Bpe

/** Round-7 scale proof: the two new surfaces under load.
  *
  * 1. BPE encode at TOKENIZER scale — the claim behind the round-7 kernel
  *    rewrite: a real merge table (1,000 ranks here; the expression-fold
  *    alternative dies well before that) replayed over millions of
  *    DISTINCT words, with losslessness asserted for EVERY row
  *    (concatenated tokens must reconstruct each word) and a full-result
  *    checksum equality under repartitioning (the kernel is a pure
  *    function of the word — partitioning must be unobservable).
  *
  * 2. ManifestWarehouse commit atomicity under concurrency — a reader
  *    polling while a writer commits generations must only ever observe
  *    COMPLETE committed generations (row count exactly one of the
  *    committed sizes, never partial), and 4 threads writing 4 tables
  *    simultaneously (the SriPipeline parallel-dim pattern) must all
  *    commit and read back.
  *
  * 3. The q121 BPE→vocab→pack chain timed end to end at sf0.1.
  *
  * Run: `sbt "runMain graft.ScaleProofR7 /root/testdata/sf0.1 SCALEPROOF_r7.json"`
  */
object ScaleProofR7 {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r7.json")
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

    // ---- 1. BPE encode: 1,000 merges × 2M distinct words -------------
    val hex = "0123456789abcdef".map(_.toString)
    val pairMerges = for (a <- hex; b <- hex) yield (a, b) // 256 firing ranks
    val tripleMerges = (for (a <- hex; b <- hex; c <- hex) yield (a + b, c)).take(744)
    val merges = (pairMerges ++ tripleMerges).toSeq // 1,000 ranks, all plausible on hex words
    val nWords = 2000000L
    val words = spark.range(nWords)
      .select(col("id").as("doc_id"), md5(col("id").cast("string")).as("text"))
      .localCheckpoint(true)
    val t1 = System.nanoTime()
    val enc = Bpe.encode(words, "text", "doc_id", merges)
      .localCheckpoint(true)
    val nEncoded = enc.count()
    val bpeSec = secs(t1)
    // losslessness for EVERY word: tokens concatenate back to the word
    val lossy = enc.join(words, Seq("doc_id"))
      .where(array_join(col("bpe_tokens"), "") =!= col("text")).count()
    // order-insensitive full-result checksum must survive repartitioning
    def checksum(df: DataFrame): Long =
      df.agg(sum(xxhash64(col("doc_id"), array_join(col("bpe_tokens"), " "))))
        .head.getLong(0)
    val sumA = checksum(enc)
    val sumB = checksum(Bpe.encode(words.repartition(97), "text", "doc_id", merges))
    val bpeOk = lossy == 0 && sumA == sumB && nEncoded == nWords

    // ---- 2. ManifestWarehouse atomicity under concurrency ------------
    val root = java.nio.file.Files.createTempDirectory("mwh-proof").toString
    val wh = ManifestWarehouse(spark, root)
    val c1 = 400000L; val c2 = 650000L
    wh.write("t", spark.range(c1).toDF("id"))
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val writer = new Thread(() => {
      wh.write("t", spark.range(c2).toDF("id"))
      wh.write("t", spark.range(c1).toDF("id"))
      wh.write("t", spark.range(c2).toDF("id"))
    })
    writer.start()
    while (writer.isAlive) { observed.add(wh.read("t").count()); Thread.sleep(50) }
    observed.add(wh.read("t").count())
    import scala.jdk.CollectionConverters._
    val obs = observed.asScala.toList
    val torn = obs.count(c => c != c1 && c != c2)
    // 4 tables written concurrently (the parallel-dim pattern) all commit
    val tables = (0 until 4).map(i => s"dim_$i")
    graft.etl.Concurrency.inParallel(
      tables.map(t => () => wh.write(t, spark.range(100000L + t.length).toDF("id"))),
      spark = Some(spark))
    val parallelOk = tables.forall(t => wh.read(t).count() == 100000L + t.length)
    val whOk = torn == 0 && obs.nonEmpty && parallelOk

    // ---- 3. q121 chain at sf0.1 ---------------------------------------
    val t3 = System.nanoTime()
    val q121 = graft.queries.DocQueries.q121BpePackedSequences(spark, sfDir)
    q121.write.format("noop").mode("overwrite").save()
    val q121Sec = secs(t3)
    val q121Rows = graft.queries.DocQueries.q121BpePackedSequences(spark, sfDir).count()

    val json =
      s"""{"metric":"scaleproof_r7","sf_dir":"$sfDir",
         |"bpe_encode":{"distinct_words":$nWords,"merges":${merges.length},
         |"wall_sec":${f"$bpeSec%.1f"},"lossy_rows":$lossy,
         |"checksum_invariant_under_repartition":${sumA == sumB},"ok":$bpeOk},
         |"manifest_warehouse":{"reads_during_commits":${obs.length},
         |"torn_reads":$torn,"parallel_tables_ok":$parallelOk,"ok":$whOk},
         |"q121_chain":{"wall_sec":${f"$q121Sec%.1f"},"sequences":$q121Rows}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(bpeOk, "BPE encode failed losslessness or partitioning invariance at scale")
    require(whOk, s"ManifestWarehouse observed $torn torn reads")
    Sessions.release(spark, owned)
  }
}
