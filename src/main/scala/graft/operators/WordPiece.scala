package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-family tokenization (Schuster & Nakajima 2012; the BERT
  * tokenizer's inference rule): greedy longest-match-first segmentation of
  * each word against a piece vocabulary, single-character fallback for
  * unmatched positions. Completes the tokenizer shelf next to [[Bpe]] —
  * BPE ships a MERGE table replayed in rank order; WordPiece ships a
  * VOCABULARY consulted by maximal munch. Both are corpus-statistics
  * artifacts a 100-TB pipeline has to produce and apply distributedly.
  *
  * Scale shape (the [[Bpe]] doctrine): every statistic lives on the
  * DISTINCT-WORD table, never the corpus. Vocabulary induction is one
  * corpus-cardinality word count (the q47 Zipf shape), then ONE
  * vocabulary-cardinality substring explosion + map-side-combinable count
  * + top-k (TakeOrderedAndProject). Encoding runs the greedy scan once
  * per DISTINCT word as a plain Scala kernel over a broadcast-sized
  * vocabulary set, and the corpus pays one equi-join on the word —
  * exactly [[Bpe.encode]]'s join shape.
  *
  * Determinism: induction ties break (count desc, piece asc); the greedy
  * scan has no ties (at a fixed position and length at most one vocab
  * piece can match). Every stage replays in ANSI SQL — the maximal munch
  * itself replays as a per-(word, position) longest-prefix "jump" table
  * walked by a recursive CTE, which is how the oracle checks it.
  */
object WordPiece {

  /** Corpus-weighted substring occurrence counts: every substring of
    * length 1..maxPieceLen of every distinct word, weighted by the word's
    * corpus count, multiplicity included ("aaa" contributes "aa" twice).
    * The explosion is row-local on the distinct-word table (vocabulary
    * cardinality × word length × maxPieceLen rows — bounded, never
    * corpus-sized); the only shuffle is the piece-count aggregation.
    */
  def substringCounts(df: DataFrame, textCol: String, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    Bpe.wordTable(df, textCol)
      .select(col("cnt"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
  }

  /** The induced piece vocabulary: top `vocabSize` substrings by
    * (count desc, piece asc) with a dense 1-based rank. The top-k plans
    * as TakeOrderedAndProject; the rank window runs over the k collected
    * rows only (bounded by vocabSize — the q88-bounds class of global
    * window).
    */
  def induceVocab(df: DataFrame, textCol: String, maxPieceLen: Int,
                  vocabSize: Int): DataFrame =
    vocabFromCounts(substringCounts(df, textCol, maxPieceLen), vocabSize)

  /** [[induceVocab]]'s tail over an existing (piece, cnt) table — shared
    * with the incremental form.
    */
  def vocabFromCounts(counts: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("piece"))
    counts
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Merge an increment's substring counts into the stored count state —
    * substring statistics are ADDITIVE over any document partition, so
    * one full-outer sum per touched piece makes incremental vocabulary
    * maintenance EXACT (merged counts == counts of the union, hence the
    * merged top-k == the full retrain): the tokenizer-shelf member of
    * the incremental-state family. O(stored pieces ∪ increment pieces),
    * never re-reads stored documents.
    */
  def mergeCounts(stored: DataFrame, incCounts: DataFrame): DataFrame =
    stored.select(col("piece"), col("cnt").as("__s"))
      .join(incCounts.select(col("piece"), col("cnt").as("__n")), Seq("piece"), "full_outer")
      .select(col("piece"),
        (coalesce(col("__s"), lit(0L)) + coalesce(col("__n"), lit(0L))).as("cnt"))

  /** Greedy longest-match-first segmentation of one word: at each
    * position take the longest vocabulary piece prefixing the remainder;
    * if none matches (not even the single character), emit that character
    * as an out-of-vocabulary fallback and advance one. Returns the piece
    * sequence and the fallback count. Runs on executors inside
    * [[encode]]'s typed map over the DISTINCT-word table.
    */
  private[operators] def maxMatch(word: String, vocab: Set[String],
                                  maxPieceLen: Int): (Array[String], Int) = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var oov = 0
    var p = 0
    while (p < word.length) {
      var l = math.min(maxPieceLen, word.length - p)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = word.substring(p, p + l)
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) { out += word.substring(p, p + 1); oov += 1; p += 1 }
      else { out += hit; p += hit.length }
    }
    (out.toArray, oov)
  }

  /** Encode the corpus against a piece vocabulary: greedy maximal munch
    * per DISTINCT word (Scala kernel, vocabulary as a broadcast-sized
    * set), then one equi-join on the word and a per-document stitch in
    * word order. Output: (idCol, n_pieces, n_oov, pieces) with `pieces`
    * the space-joined piece stream across the document's words.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             vocab: Seq[String], maxPieceLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocabSet = vocab.toSet
    val words = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("__pos", "__w")))
      .where(col("__w") =!= "")
    val encoded = words.select(col("__w")).distinct().as[String]
      .mapPartitions { it =>
        it.map { w =>
          val (pieces, oov) = maxMatch(w, vocabSet, maxPieceLen)
          (w, pieces, oov)
        }
      }
      .toDF("__w", "__pieces", "__oov")
    words.join(encoded, Seq("__w"))
      .groupBy(col(idCol))
      .agg(
        sum(size(col("__pieces"))).cast("long").as("n_pieces"),
        sum(col("__oov")).cast("long").as("n_oov"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("__pos"), col("__pieces")))),
          p => p.getField("__pieces"))), " ").as("pieces"))
  }
}
