package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unigram-LM (SentencePiece; Kudo 2018) subword TRAINING — the third
  * member of the tokenizer shelf: [[Bpe]] trains a merge table, [[WordPiece]]
  * induces a count-ranked vocabulary, and the unigram LM fits PIECE
  * PROBABILITIES by EM over all segmentations, then prunes to a target
  * vocabulary. Reference scope: the reference ETL
  * (dags/sri_vehiculos_etl_dag.py) has no tokenizer; this extends the
  * LLM-training-data shelf the engine adds on top of it.
  *
  * Scale shape (the [[Bpe.train]] / [[LogReg.fitWeights]] driver-round
  * doctrine): the E-step is a per-DISTINCT-WORD kernel over a
  * broadcast-sized probability map — the corpus is never rescanned (word
  * counts come from one [[Bpe.wordTable]] aggregation), the only shuffle
  * per iteration is one map-side-combinable per-piece sum, and the driver
  * collects exactly vocabulary-cardinality scalars for the M-step. 1000
  * executors see the same plan as local[32].
  *
  * Determinism / engine parity — the q198 "integer ranks instead of float
  * log-probs" idea carried one step further: probabilities are quantized
  * to INTEGER TEN-THOUSANDTHS (`p4` = max(1, round(p·10⁴))), so the
  * forward/backward DP over segmentations is PURE INTEGER arithmetic —
  * alpha/beta/Z are exact BigInt path-weight sums, order-independent and
  * replayable in DuckDB HUGEINT with zero float drift. Floats appear in
  * exactly two places, both the [[LogReg]] sigmoid9 shape (one correctly-
  * rounded division of identical integers/decimals, then round-half-away):
  * the per-(word, piece) expected count γ = round(Σ alpha·p4·beta / Z, 9),
  * and the M-step renormalization p4' = max(1, round((e/Σe)·10⁴, 0)).
  * Expected counts accumulate in DECIMAL(28,12) (exact, partition-order-
  * invariant). The max(·, 1) floor keeps every piece segmentable (a
  * single-char path always exists), so Z > 0 for every word whose
  * characters are in the vocabulary — and the seed includes every
  * occurring character by construction.
  *
  * HUGEINT headroom (the oracle's 128-bit bound, documented not assumed):
  * with p4 ≤ 10⁴ and maxPieceLen ≥ 2, an n-char word has < 2ⁿ⁻¹
  * segmentations, so Z < 2ⁿ⁻¹·10⁴ⁿ and the largest oracle intermediate
  * (alpha·p4 during the γ numerator) stays under 2ⁿ⁻¹·10⁴⁽ⁿ⁺¹⁾ — at the
  * oracle's n ≤ 8 guard that is ~1.3e38 < 1.7e38 (HUGEINT max). The Scala
  * kernel uses BigInt and has no bound; the oracle error()s loudly on
  * longer words rather than silently truncating (the q198 lguard rule).
  */
object UnigramLm {

  /** Seed vocabulary with corpus-weighted counts: the top `seedSize`
    * substrings (length 1..maxPieceLen, multiplicity kept) by
    * (count desc, piece asc) — [[WordPiece.substringCounts]]'s statistic —
    * UNIONED with every single-character piece that occurs, so every word
    * stays segmentable after any amount of EM re-weighting. Bounded by
    * seedSize + alphabet size; the top-k plans as TakeOrderedAndProject.
    */
  def seedCounts(df: DataFrame, textCol: String, maxPieceLen: Int,
                 seedSize: Int): DataFrame = {
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    val counts = WordPiece.substringCounts(df, textCol, maxPieceLen)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val top = counts.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    val chars = counts.where(length(col("piece")) === 1)
    top.unionByName(chars).groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** p4 = max(1, round((cnt / total)·10⁴, 0)) half-away-from-zero — both
    * engines' `round` on one correctly-rounded double division of exact
    * integers. The floor keeps zero-probability pieces segmentable.
    */
  def initProb4(seed: Seq[(String, Long)]): Map[String, Long] = {
    val total = seed.map(_._2).sum
    require(total > 0, "seed counts must be positive")
    seed.map { case (piece, cnt) =>
      piece -> math.max(1L, roundHalfAway((cnt.toDouble / total.toDouble) * 10000.0))
    }.toMap
  }

  /** One word's E-step: exact integer forward/backward over all
    * segmentations into vocabulary pieces (lengths 1..maxPieceLen), then
    * the per-piece expected count γ = round(num/Z, 9) where num =
    * Σ_occurrences alpha(p)·p4·beta(p+l) — the total path weight through
    * each occurrence. Emits one row per piece OCCURRING in the word
    * (γ may round to 0; the row still exists, mirroring the oracle's
    * option join). A word with an out-of-vocabulary character has Z = 0
    * and contributes nothing — impossible for [[seedCounts]]-seeded
    * vocabularies, which carry every occurring character.
    */
  private[operators] def expectedCounts(word: String, prob4: Map[String, Long],
                                        maxPieceLen: Int): Seq[(String, Double)] = {
    val n = word.length
    val alpha = new Array[BigInt](n + 1)
    alpha(0) = BigInt(1)
    var j = 1
    while (j <= n) {
      var s = BigInt(0)
      var l = math.min(maxPieceLen, j)
      while (l >= 1) {
        val p4 = prob4.getOrElse(word.substring(j - l, j), 0L)
        if (p4 > 0 && alpha(j - l).signum != 0) s += alpha(j - l) * p4
        l -= 1
      }
      alpha(j) = s
      j -= -1
    }
    val z = alpha(n)
    if (z.signum == 0) return Seq.empty
    val beta = new Array[BigInt](n + 1)
    beta(n) = BigInt(1)
    var p = n - 1
    while (p >= 0) {
      var s = BigInt(0)
      var l = math.min(maxPieceLen, n - p)
      while (l >= 1) {
        val p4 = prob4.getOrElse(word.substring(p, p + l), 0L)
        if (p4 > 0 && beta(p + l).signum != 0) s += beta(p + l) * p4
        l -= 1
      }
      beta(p) = s
      p -= 1
    }
    val num = scala.collection.mutable.HashMap.empty[String, BigInt]
    p = 0
    while (p < n) {
      var l = math.min(maxPieceLen, n - p)
      while (l >= 1) {
        val piece = word.substring(p, p + l)
        val p4 = prob4.getOrElse(piece, 0L)
        if (p4 > 0)
          num.update(piece,
            num.getOrElse(piece, BigInt(0)) + alpha(p) * p4 * beta(p + l))
        l -= 1
      }
      p += 1
    }
    val zd = z.doubleValue
    num.toSeq.map { case (piece, nm) =>
      piece -> java.math.BigDecimal.valueOf(nm.doubleValue / zd)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  /** One EM iteration over a (word, cnt) table: E-step kernel per
    * distinct word (broadcast probabilities), one map-side-combinable
    * DECIMAL(28,12) sum per piece, vocabulary-cardinality collect, then
    * the M-step renormalization on the driver. Returns (expected counts
    * by piece, updated p4 map).
    */
  def emIterate(words: DataFrame, prob4: Map[String, Long],
                maxPieceLen: Int): (Seq[(String, java.math.BigDecimal)], Map[String, Long]) = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(prob4)
    val contrib = words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .flatMap { case (w, c) =>
        expectedCounts(w, bc.value, maxPieceLen).map { case (piece, g9) => (piece, g9, c) }
      }
      .toDF("piece", "g9", "cnt")
    val rows = contrib
      .groupBy(col("piece"))
      .agg(sum((col("g9").cast("decimal(19,9)") * col("cnt")).cast("decimal(28,12)"))
        .as("e"))
      .collect()
    val e = rows.map(r => r.getString(0) -> r.getDecimal(1)).toSeq
    val tot = e.map(_._2).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    require(tot.signum > 0, "unigram EM: zero total expected count — empty corpus?")
    val totD = tot.doubleValue
    val next = e.map { case (piece, ev) =>
      piece -> math.max(1L, roundHalfAway((ev.doubleValue / totD) * 10000.0))
    }.toMap
    (e, next)
  }

  /** `iters` EM rounds from the [[seedCounts]] initialization. Returns the
    * trained table as a local literal (the [[LogReg.fit]] contract):
    * (piece, p4 — probability in ten-thousandths after the last M-step,
    * e — the last E-step's expected count, DECIMAL(28,12)). Pieces the EM
    * starved keep p4 = 1 (the floor), so the output always carries the
    * full seed vocabulary: pruning is [[prune]]'s job, not a side effect.
    */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int, seedSize: Int,
            iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val seed = seedCounts(df, textCol, maxPieceLen, seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var p4 = initProb4(seed)
    val words = Bpe.wordTable(df, textCol).select(col("word"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var e: Seq[(String, java.math.BigDecimal)] = Seq.empty
    var i = 0
    while (i < iters) {
      val (ei, ni) = emIterate(words, p4, maxPieceLen)
      e = ei; p4 = ni
      i += 1
    }
    words.unpersist()
    e.map { case (piece, ev) => (piece, p4(piece), new java.math.BigDecimal(ev.toPlainString)) }
      .toDF("piece", "p4", "e")
      .select(col("piece"), col("p4"), col("e").cast("decimal(28,12)").as("e"))
  }

  /** Prune a [[train]] output to the top `keep` pieces by
    * (e desc, piece asc) PLUS every single-character piece (coverage is
    * non-negotiable — dropping a character makes some word unsegmentable),
    * re-ranked 1..m by the same order. Monotone by construction: the
    * retained set at keep=k is a subset of the retained set at any
    * k' > k (top-k by a fixed total order nests), which the spec pins.
    * Bounded input (vocabulary-cardinality), so the rank window is the
    * q88-bounds class of global window.
    */
  def prune(trained: DataFrame, keep: Int): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("e").desc, col("piece"))
    trained
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= keep || length(col("piece")) === 1)
      .withColumn("rank", row_number().over(w).cast("long"))
      .drop("__r")
  }

  private def roundHalfAway(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
}
