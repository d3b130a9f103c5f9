package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring matching (Aho–Corasick 1975) — the blocklist
  * primitive of a training-data curation pipeline: "which of these 10^3–
  * 10^5 banned phrases occur in each document, how often, and which
  * documents survive". Reference scope: the reference ETL
  * (dags/sri_vehiculos_etl_dag.py) has no text scanning at all; this
  * extends the LLM-training-data shelf (bad-word / boilerplate-phrase /
  * PII-keyword filtering) alongside [[TextAnalysis]]'s
  * quality scores and [[UrlCuration]]'s domain rules.
  *
  * Scale shape — why an automaton and not `contains`/`rlike` per
  * pattern? The naive plan is |patterns| full-corpus scans (or a
  * patterns×documents cross join): at 100 TB and 10^4 patterns that is
  * 10^4 corpus passes. Here:
  *
  *   1. the automaton is built ONCE, driver-side, from the pattern list
  *      — blocklists are vocabulary-cardinality (the bounded-collect
  *      class of [[WordPiece]]'s vocab, NEVER corpus data) — and
  *      broadcast to every task;
  *   2. matching is ONE corpus pass, `mapPartitions` over documents
  *      (genuinely procedural per-character DFA stepping, the rare case
  *      the relational API cannot express), O(len + matches) per
  *      document INDEPENDENT of the pattern count;
  *   3. the emitted frame is ∝ actual matches (doc, pattern, count),
  *      never ∝ docs×patterns.
  *
  * Semantics (what the DuckDB oracle replays position by position):
  * case-insensitive SUBSTRING occurrences, overlapping included — a
  * count for every text position where a pattern copy ends. Dictionary-
  * suffix outputs are real matches ("scan" ending at i also ends "can"
  * and "an" there), which is exactly what the per-position replay
  * counts, so the automaton's output links are oracle-checked, not just
  * its happy path.
  */
object PhraseMatch {

  /** The built automaton: goto tries + BFS failure links + output lists
    * (pattern indices ending at each node, dictionary-suffix closure).
    * Immutable, serializable, broadcast-sized ∝ total pattern chars.
    */
  final class AcAutomaton private[PhraseMatch] (
      private[PhraseMatch] val goto_ : Array[Map[Char, Int]],
      private[PhraseMatch] val fail: Array[Int],
      private[PhraseMatch] val out: Array[Array[Int]],
      val patterns: Array[String]) extends Serializable {

    /** SPARSE occurrence counts (pattern index -> count) over `text`,
      * overlapping included: one forward pass, fail-link fallback on
      * mismatch (amortized O(1) per character), output list drained at
      * every position. Sparse is load-bearing for the scale claim: a
      * dense per-document count array is O(|patterns|) to allocate and
      * scan PER DOCUMENT — measured 30× slower at 10k patterns — while
      * the hit map is O(len + matches).
      */
    def countsIn(text: String): scala.collection.Map[Int, Long] = {
      val cnt = new scala.collection.mutable.HashMap[Int, Long]
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !goto_(s).contains(c)) s = fail(s)
        s = goto_(s).getOrElse(c, 0)
        val os = out(s)
        var j = 0
        while (j < os.length) {
          cnt.update(os(j), cnt.getOrElse(os(j), 0L) + 1L)
          j += 1
        }
        i += 1
      }
      cnt
    }
  }

  /** Build the automaton from a bounded, non-empty, duplicate-free
    * pattern list (patterns are lowercased; matching is
    * case-insensitive via lowercasing both sides).
    */
  def buildAutomaton(patterns: Seq[String]): AcAutomaton = {
    val pats = patterns.map(p => Option(p).map(_.toLowerCase).orNull).toArray
    require(pats.nonEmpty, "pattern list must be non-empty")
    require(pats.forall(p => p != null && p.nonEmpty), "patterns must be non-null and non-empty")
    require(pats.distinct.length == pats.length,
      s"patterns must be distinct after lowercasing: ${pats.diff(pats.distinct).distinct.mkString(",")}")
    val goto_ = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // phase 1: the trie
    for ((p, pi) <- pats.zipWithIndex) {
      var s = 0
      for (c <- p) {
        goto_(s).get(c) match {
          case Some(nxt) => s = nxt
          case None =>
            goto_ += Map.empty; outB += Nil
            val nxt = goto_.length - 1
            goto_(s) = goto_(s).updated(c, nxt)
            s = nxt
        }
      }
      outB(s) = pi :: outB(s)
    }
    // phase 2: BFS failure links + dictionary-suffix output closure
    val fail = new Array[Int](goto_.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto_(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- goto_(u)) {
        var f = fail(u)
        while (f != 0 && !goto_(f).contains(c)) f = fail(f)
        fail(v) = if (goto_(f).contains(c) && goto_(f)(c) != v) goto_(f)(c) else 0
        outB(v) = outB(v) ++ outB(fail(v))
        queue += v
      }
    }
    new AcAutomaton(goto_.toArray, fail, outB.map(_.sorted.toArray).toArray, pats)
  }

  /** Per-(document, pattern) occurrence counts over `textCol`,
    * case-insensitive, overlapping included; only matched pairs are
    * emitted. Output: (<idCol> LONG, pat STRING, cnt LONG).
    */
  def matchCounts(docs: DataFrame, textCol: String, idCol: String,
                  patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(buildAutomaton(patterns))
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), lower(col(textCol)).as("__t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ac = bc.value
        rows.flatMap { case (id, t) =>
          ac.countsIn(t).iterator.map { case (pi, c) => (id, ac.patterns(pi), c) }
        }
      }
      .toDF(idCol, "pat", "cnt")
  }

  /** The curation verdict: documents with NO blocklist hit survive —
    * the [[matchCounts]] match table turned into a left-anti join, so
    * the corpus is scanned once and the anti side is ∝ matched docs.
    */
  def filterClean(docs: DataFrame, textCol: String, idCol: String,
                  patterns: Seq[String]): DataFrame =
    docs.join(
      matchCounts(docs, textCol, idCol, patterns)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
