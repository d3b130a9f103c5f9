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
  * 4. Exact-substring strip at corpus scale — 200k documents, half
  *    carrying a known 8-token boilerplate header ahead of unique
  *    md5-derived tails: the strip must remove EXACTLY the 8 header
  *    tokens from every carrier (boundary windows that mix header and
  *    unique tail never recur, so they must survive), leave clean docs
  *    untouched, and checksum-match under repartitioning.
  *
  * 5. Fuzzy join at key-space scale — 510k strings (500k md5 keys +
  *    10k planted single-substitution mutants): the symmetric-delete
  *    blocking must recover EXACTLY the planted pairs (md5 hex keys
  *    admit no accidental distance-1 neighbors at this density) through
  *    a ~17M-variant equi-join, never a pair scan.
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

    // ---- 4. stripRepeatedSpans: 200k docs, half with a known header ---
    val header = "legal boiler plate header shared across many documents" // 8 tokens
    val nDocs = 200000L
    val corpus = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat(
          when(col("id") % 2 === 0, lit(header + " ")).otherwise(lit("")),
          // the FIRST tail token embeds the doc id verbatim: an 8-hex-char
          // first word birthday-collides at 100k docs (16^8 ≈ 4.3e9,
          // ~1 expected pair), which makes a header+tail boundary window
          // genuinely recur and the strip correctly widen past 8 tokens —
          // the proof needs boundary windows that provably NEVER recur
          col("id").cast("string"), lit("u "),
          // then a unique 8-word tail from two md5s split into 8-char words
          regexp_replace(concat(md5(col("id").cast("string")),
            md5(concat(lit("s"), col("id").cast("string")))), "(.{8})", "$1 "))
          .as("text"))
      .localCheckpoint(true)
    val t4 = System.nanoTime()
    val stripped = graft.operators.TextAnalysis
      .stripRepeatedSpans(corpus, "text", "doc_id", k = 8, minDocs = 2)
      .localCheckpoint(true)
    val stripSec = secs(t4)
    val stripAgg = stripped.agg(
      count(lit(1)).as("n"),
      sum(when(col("doc_id") % 2 === 0 && col("n_removed") === 8, 1L).otherwise(0L)),
      sum(when(col("doc_id") % 2 =!= 0 && col("n_removed") === 0, 1L).otherwise(0L))).head
    val (stripN, evenOk, oddOk) = (stripAgg.getLong(0), stripAgg.getLong(1), stripAgg.getLong(2))
    def stripChecksum(df: DataFrame): Long =
      df.agg(sum(xxhash64(col("doc_id"), col("n_removed"), col("clean_text")))).head.getLong(0)
    val stripInv = stripChecksum(stripped) ==
      stripChecksum(graft.operators.TextAnalysis.stripRepeatedSpans(
        corpus.repartition(97), "text", "doc_id", k = 8, minDocs = 2))
    val stripOk = stripN == nDocs && evenOk == nDocs / 2 && oddOk == nDocs / 2 && stripInv

    // ---- 5. fuzzy join: 500k md5 keys + 10k planted mutants -----------
    val nKeys = 500000L
    val bases = spark.range(nKeys)
      .select(col("id"), md5(col("id").cast("string")).as("name"))
    val mutants = spark.range(0, nKeys, 50) // 10k planted neighbors
      .select((col("id") + 10000000L).as("id"),
        // 'z' never occurs in md5 hex: distance to the base is exactly 1,
        // and to every other key stays >1
        concat(lit("z"), expr("substr(md5(cast(id as string)), 2)")).as("name"))
    val keys = bases.unionByName(mutants).localCheckpoint(true)
    val t5 = System.nanoTime()
    val pairs = graft.operators.FuzzyJoin.editDistance1Join(keys, "name", "id")
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val fuzzySec = secs(t5)
    val nPairs = pairs.count()
    val planted = nKeys / 50
    val plantedFound = pairs
      .where(col("id_b") === col("id_a") + 10000000L && col("id_a") % 50 === 0).count()
    val fuzzyOk = nPairs == planted && plantedFound == planted

    val json =
      s"""{"metric":"scaleproof_r7","sf_dir":"$sfDir",
         |"bpe_encode":{"distinct_words":$nWords,"merges":${merges.length},
         |"wall_sec":${f"$bpeSec%.1f"},"lossy_rows":$lossy,
         |"checksum_invariant_under_repartition":${sumA == sumB},"ok":$bpeOk},
         |"manifest_warehouse":{"reads_during_commits":${obs.length},
         |"torn_reads":$torn,"parallel_tables_ok":$parallelOk,"ok":$whOk},
         |"q121_chain":{"wall_sec":${f"$q121Sec%.1f"},"sequences":$q121Rows},
         |"strip_repeated":{"docs":$nDocs,"wall_sec":${f"$stripSec%.1f"},
         |"carriers_stripped_exactly":$evenOk,"clean_docs_untouched":$oddOk,
         |"checksum_invariant_under_repartition":$stripInv,"ok":$stripOk},
         |"fuzzy_join":{"keys":${nKeys + planted},"planted_pairs":$planted,
         |"wall_sec":${f"$fuzzySec%.1f"},"pairs_found":$nPairs,
         |"planted_found":$plantedFound,"ok":$fuzzyOk}}"""
        .stripMargin.replace("\n", "")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    require(bpeOk, "BPE encode failed losslessness or partitioning invariance at scale")
    require(whOk, s"ManifestWarehouse observed $torn torn reads")
    require(stripOk, s"stripRepeatedSpans scale proof failed: n=$stripN even=$evenOk odd=$oddOk inv=$stripInv")
    require(fuzzyOk, s"fuzzy join scale proof failed: pairs=$nPairs planted_found=$plantedFound of $planted")
    Sessions.release(spark, owned)
  }
}
