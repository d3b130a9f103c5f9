package graft.operators

import graft.SparkTestBase

/** SuffixDedup vs a brute-force longest-common-substring oracle: the
  * relational bounded-depth suffix array must agree with the O(n²·m)
  * all-position-pairs answer on a corpus engineered to hit every edge —
  * cross-doc spans, within-doc self-repeats, spans longer than depth
  * (saturation), docs at/below minLen, null/empty/whitespace text.
  */
class SuffixDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val minLen = 3
  private val depth = 6

  // (doc_id, text)
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",       // shares 5-token span with 2
    2L -> "yesterday the quick brown fox jumps high above everything", // span: "the quick brown fox jumps"
    3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",  // shares ALL 10 tokens with 4 (> depth → saturates)
    4L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    5L -> "go go go go go go",                                         // within-doc self-repeat only
    6L -> "completely unique words nobody else ever wrote here",       // no dup ≥ minLen
    7L -> "too short",                                                 // < minLen tokens → 0/0
    8L -> "  The   QUICK brown fox JUMPS over nothing  ",              // case/whitespace-normalized overlap with 1
    9L -> null.asInstanceOf[String],                                   // null text → 0/0
    10L -> ""                                                          // empty → 0/0
  )

  private def tokens(t: String): Array[String] =
    if (t == null) Array.empty
    else {
      val trimmed = t.trim.toLowerCase
      if (trimmed.isEmpty) Array("") else trimmed.split("\\s+")
    }

  /** Brute force: for every candidate start (doc, pos) with ≥ minLen
    * tokens remaining, the max depth-truncated common prefix with every
    * OTHER candidate start; per-doc max and count of starts ≥ minLen.
    */
  private def brute(minLen: Int, depth: Int): Map[Long, (Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> tokens(t) }
    val starts = for {
      (id, ts) <- toks
      pos <- 0 to ts.length - minLen
    } yield (id, pos, ts.slice(pos, math.min(pos + depth, ts.length)))
    def common(a: Array[String], b: Array[String]): Long = {
      var i = 0
      while (i < a.length && i < b.length && a(i) == b(i)) i += 1
      i.toLong
    }
    val perDoc = starts.map { case (id, pos, sfx) =>
      val best = starts.collect {
        case (id2, pos2, sfx2) if (id2, pos2) != (id, pos) => common(sfx, sfx2)
      }.maxOption.getOrElse(0L)
      (id, best)
    }
    corpus.map { case (id, _) =>
      val mine = perDoc.filter(d => d._1 == id && d._2 >= minLen).map(_._2)
      id -> (if (mine.isEmpty) (0L, 0L) else (mine.max, mine.size.toLong))
    }.toMap
  }

  test("longestDupPerDoc matches the brute-force longest-common-substring oracle") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixDedup.longestDupPerDoc(df, "text", "doc_id", minLen, depth)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = brute(minLen, depth)
    assert(got.keySet === want.keySet)
    for ((id, w) <- want)
      assert(got(id) === w, s"doc $id: got ${got(id)}, brute-force says $w")
  }

  test("a shared span longer than depth saturates at exactly depth") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixDedup.longestDupPerDoc(df, "text", "doc_id", minLen, depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 3/4 share 10 tokens; bounded depth must report exactly `depth`,
    // not 10 and not depth-ish
    assert(got(3L) === depth.toLong)
    assert(got(4L) === depth.toLong)
  }

  test("within-doc self-repeats count as duplication (Lee et al. semantics)") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixDedup.longestDupPerDoc(df, "text", "doc_id", minLen, depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "go go go go go go": suffix at pos 1 (6 tokens) vs pos 2 (5 tokens)
    // share 5 leading tokens
    assert(got(5L) === 5L)
  }

  test("cross-doc span is reported at its true length, not the shingle size") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixDedup.longestDupPerDoc(df, "text", "doc_id", minLen, depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2 shares "the quick brown fox jumps" = 5 tokens with docs 1/8;
    // doc 1 additionally shares "... jumps over" = 6 tokens with doc 8
    // (case/whitespace-normalized). The fixed-k inventory can only say
    // "a 3-gram repeats"; this reports the true span lengths.
    assert(got(1L) === 6L)
    assert(got(2L) === 5L)
    assert(got(8L) === 6L)
  }

  test("short, null, and empty documents report 0/0 but stay in the report") {
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixDedup.longestDupPerDoc(df, "text", "doc_id", minLen, depth)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(7L) === ((0L, 0L)))
    assert(got(9L) === ((0L, 0L)))
    assert(got(10L) === ((0L, 0L)))
  }

  test("stripAllButFirst removes later occurrences, keeps the first, rebuilds text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "intro words then the quick brown fox jumps over the end"),  // shares 7-token span
      (3L, "the quick brown fox jumps over the lazy dog"),              // exact dup of 1 → strips empty
      (4L, "totally unrelated content with no shared spans here"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = SuffixDedup.stripAllButFirst(df, "text", "doc_id", minLen = 4, depth = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3))).toMap
    // doc 1 is the first occurrence everywhere → untouched
    assert(got(1L) === ((9L, 0L, "the quick brown fox jumps over the lazy dog")))
    // doc 3 duplicates doc 1 exactly → strips to empty
    assert(got(3L) === ((9L, 9L, "")))
    // doc 2's shared "the quick brown fox jumps over the" (7 tokens,
    // positions 4..10) strips; intro and tail survive
    assert(got(2L) === ((11L, 7L, "intro words then end")))
    // untouched docs pass through; null text stays null
    assert(got(4L)._2 === 0L && got(4L)._3.nonEmpty)
    assert(got(5L) === ((0L, 0L, null)))
  }

  test("graft_longest_dup SQL table function plans as the Column API") {
    graft.GraftTableFunctions.all.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }
    corpus.toDF("doc_id", "text").createOrReplaceTempView("docs_tf_sfx_v")
    val sqlDf = spark.sql(
      s"SELECT * FROM graft_longest_dup('docs_tf_sfx_v', 'text', 'doc_id', $minLen, $depth)")
    val apiDf = SuffixDedup.longestDupPerDoc(
      spark.table("docs_tf_sfx_v"), "text", "doc_id", minLen, depth)
    assert(sqlDf.queryExecution.optimizedPlan
        .sameResult(apiDf.queryExecution.optimizedPlan),
      "SQL longest_dup must plan as the Column API")
    assert(sqlDf.orderBy("doc_id").collect().map(_.toString).toSeq ===
      apiDf.orderBy("doc_id").collect().map(_.toString).toSeq)
  }

  test("suffix rows emit only candidate starts with >= minLen tokens, depth-truncated") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val rows = SuffixDedup.suffixRows(df, "text", "doc_id", minLen = 2, depth = 3)
      .orderBy("pos").collect()
    assert(rows.map(_.getInt(2)).toSeq === Seq(1, 2, 3, 4))
    assert(rows.map(_.getSeq[String](1).mkString(" ")).toSeq ===
      Seq("a b c", "b c d", "c d e", "d e"))
  }
}
