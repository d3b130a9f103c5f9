package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Round-15 scale proof: the unigram-LM trainer (q199/q200/q201) at
  * 100-TB-shaped sizes, every assertion exact by construction.
  *
  * 1. Whole-trajectory DETERMINISM at 1M docs: two full trains (2 EM
  *    iterations each) of the same 1M-document corpus — once as
  *    generated, once repartitioned to a coprime partition count — must
  *    produce IDENTICAL (piece, p3, e9) tables. This is the point of the
  *    integer-exact EM: expected counts are integer sums, so partition
  *    order and parallelism cannot move a single billionth. (The float
  *    form of this trainer was observed diverging at 9-dp rounding
  *    boundaries before r15 switched it to integer arithmetic.)
  * 2. Kernel parity at the trained probabilities: for the 25 longest
  *    distinct words of the corpus, the forward/backward DP's expected
  *    counts equal brute-force enumeration over every segmentation
  *    (driver-side, exact BigInt) — the spec's theorem re-asserted at
  *    the trained, fully-skewed probability table rather than a fixture.
  * 3. Serving at scale: q201's max-probability encode over the 1M docs
  *    must be LOSSLESS (pieces reassemble every document exactly — the
  *    r14 WordPiece doctrine) with zero OOV (the char-preserving prune
  *    guarantees coverage).
  *
  * Scale shape on display: the corpus is 1M docs / 10M word occurrences
  * but only a few hundred DISTINCT words (336 measured — the squared-
  * skew residue map collapses the 2444-slot lexicon, which only sharpens
  * the point) — the E-step kernel and the encode DP run at vocabulary
  * scale; the corpus pays one word-count aggregation (train) and one
  * equi-join (encode). Wall times for both are recorded.
  *
  * Run: `sbt "runMain graft.ScaleProofR15 unused SCALEPROOF_r15.json"`
  */
object ScaleProofR15 {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r15.json")
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
    import spark.implicits._

    // 1M docs x 10 words; a few-hundred-word lexicon (336 distinct) of
    // length 2..8 built from a letter + a numeric tail (chars 'a'..'z',
    // '0'..'9'), Zipf-ish skew via pmod(xxhash64) so EM has real mass
    // differences to move. Deterministic: no RNG anywhere.
    val nDocs = 1000000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(9)), i => {
        val h = xxhash64(col("id"), i)
        val skew = pmod(h, lit(1000L)) // 0..999; squared -> head-heavy
        val wordIx = pmod(skew * skew, lit(2444L))
        val letter = chr(lit(97) + pmod(wordIx, lit(26L)))
        val tail = pmod(wordIx, lit(94L)) // 0..93 -> 1-2 char numeric tail
        concat(letter, tail.cast("string"))
      }), " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = docs.select(explode(split(col("text"), " "))).count()
    val nDistinct = docs.select(explode(split(col("text"), " ")).as("w"))
      .select("w").distinct().count()

    // ---- 1. determinism: train == train on a repartitioned corpus ----
    val t0 = System.nanoTime()
    val trainedA = UnigramLm.train(docs, "text", maxPieceLen = 5,
      seedSize = 64, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toBigInteger)).sorted.toSeq
    val trainSec = secs(t0)
    val trainedB = UnigramLm.train(docs.repartition(7), "text", maxPieceLen = 5,
      seedSize = 64, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toBigInteger)).sorted.toSeq
    val deterministic = trainedA == trainedB
    val vocabSize = trainedA.size

    // ---- 2. kernel parity on the longest distinct words -------------
    val p3 = trainedA.map { case (p, v, _) => p -> v }.toMap
    val longWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .select("w").distinct()
      .orderBy(length(col("w")).desc, col("w")).limit(25)
      .as[String].collect().toSeq
    def brute(word: String): Map[String, Long] = {
      def paths(p: Int): Seq[(List[String], BigInt)] =
        if (p == word.length) Seq((Nil, BigInt(1)))
        else (1 to math.min(5, word.length - p)).flatMap { l =>
          val piece = word.substring(p, p + l)
          p3.get(piece).filter(_ > 0).toSeq.flatMap { w =>
            val ew = BigInt(w) * BigInt(1000).pow(l - 1)
            paths(p + l).map { case (rest, pw) => (piece :: rest, pw * ew) }
          }
        }
      val all = paths(0)
      if (all.isEmpty) Map.empty
      else {
        val z = all.map(_._2).sum
        val num = scala.collection.mutable.HashMap.empty[String, BigInt]
        all.foreach { case (pieces, w) =>
          pieces.foreach(pc => num.update(pc, num.getOrElse(pc, BigInt(0)) + w))
        }
        num.map { case (pc, nm) => pc -> ((nm * 1000000000L * 2 + z) / (z * 2)).toLong }.toMap
      }
    }
    val parityFails = longWords.count { w =>
      UnigramLm.expectedCounts(w, p3, 5).toMap != brute(w)
    }

    // ---- 3. lossless zero-OOV serving over the 1M docs --------------
    val pruned = trainedA.sortBy { case (p, _, e) => (BigInt(e) * -1, p) }
    val keep = pruned.take(48).map(_._1).toSet ++
      trainedA.map(_._1).filter(_.length == 1)
    val servedProbs = trainedA.collect { case (p, v, _) if keep(p) => (p, v) }.toSeq
    val t1 = System.nanoTime()
    val enc = UnigramLm.viterbiEncode3(docs, "text", "doc_id", servedProbs, 5)
    val bad = enc
      .join(docs, Seq("doc_id"))
      .where(col("n_oov") =!= 0 ||
        regexp_replace(col("pieces"), " ", "") =!=
          regexp_replace(trim(lower(col("text"))), "\\s+", ""))
      .count()
    val encSec = secs(t1)
    val encoded = enc.count()

    val json =
      s"""{"n_docs":$nDocs,"n_word_occurrences":$nWords,"n_distinct_words":$nDistinct,
         |"vocab_size":$vocabSize,"train_2iters_sec":$trainSec,
         |"deterministic_under_repartition":$deterministic,
         |"kernel_brute_parity_fails":$parityFails,
         |"encode_docs":$encoded,"encode_lossless_violations":$bad,"encode_sec":$encSec}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    assert(deterministic, "train must be partition-invariant")
    assert(parityFails == 0, "kernel must match brute enumeration")
    assert(bad == 0, "encode must be lossless with zero OOV")
    Sessions.release(spark, owned)
  }
}
