package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  test("substringCounts weights by corpus count and keeps multiplicity") {
    // corpus: "aa aa b" -> words aa(x2), b(x1)
    val df = Seq("aa aa b").toDF("text")
    val got = WordPiece.substringCounts(df, "text", maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    // aa: substrings a(i=1), a(i=2), aa -> a counts 2 per word occurrence x2 = 4
    assert(got == Map("a" -> 4L, "aa" -> 2L, "b" -> 1L))
  }

  test("induceVocab ranks by count desc then piece asc") {
    val df = Seq("ab ab cd").toDF("text")
    val got = WordPiece.induceVocab(df, "text", maxPieceLen = 2, vocabSize = 3)
      .select("piece", "rank").as[(String, Long)].collect().toMap
    // counts: a2 b2 ab2 c1 d1 cd1 -> top3 = a,ab,b (count 2, lexicographic)
    assert(got == Map("a" -> 1L, "ab" -> 2L, "b" -> 3L))
  }

  test("maxMatch is greedy longest-first with single-char OOV fallback") {
    val vocab = Set("un", "believ", "able", "a", "b", "l", "e")
    val (pieces, oov) = WordPiece.maxMatch("unbelievable", vocab, maxPieceLen = 6)
    assert(pieces.toSeq == Seq("un", "believ", "able") && oov == 0)
    // 'x' and 'z' not in vocab -> emitted as fallback
    val (p2, o2) = WordPiece.maxMatch("xaz", vocab, maxPieceLen = 6)
    assert(p2.toSeq == Seq("x", "a", "z") && o2 == 2)
  }

  test("greedy maximal munch prefers the longer piece even when shorter pieces chain") {
    // vocab has both "ab" and "abc"; greedy takes "abc" then falls back on "d"
    val vocab = Set("ab", "abc", "c", "d")
    val (pieces, oov) = WordPiece.maxMatch("abcd", vocab, maxPieceLen = 3)
    assert(pieces.toSeq == Seq("abc", "d") && oov == 0)
  }

  test("encode stitches pieces per document in word order") {
    val df = Seq((1L, "abc xy"), (2L, "q")).toDF("doc_id", "text")
    val got = WordPiece.encode(df, "text", "doc_id",
        vocab = Seq("ab", "c", "x", "y"), maxPieceLen = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, "ab c x y"),
      (2L, 1L, 1L, "q")))
  }

  test("encode end-to-end with an induced vocab matches a direct replay") {
    val docs = Seq((1L, "the theme thesis"), (2L, "the the them")).toDF("doc_id", "text")
    val vocabRows = WordPiece.induceVocab(docs, "text", maxPieceLen = 3, vocabSize = 8)
      .orderBy("rank").select("piece").as[String].collect().toSeq
    val got = WordPiece.encode(docs, "text", "doc_id", vocabRows, maxPieceLen = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // replay by hand with the same kernel
    val vs = vocabRows.toSet
    val want = Seq(1L -> "the theme thesis", 2L -> "the the them").map { case (id, t) =>
      val ws = t.split("\\s+").toSeq
      val enc = ws.map(w => WordPiece.maxMatch(w, vs, 3))
      (id, enc.map(_._1.length.toLong).sum, enc.map(_._2.toLong).sum,
        enc.flatMap(_._1).mkString(" "))
    }
    assert(got.toSeq == want)
  }

  test("viterbiSegment beats greedy where maximal munch is suboptimal") {
    // vocab: ab(1), abc(2), cd(3). Greedy on "abcd": abc + fallback d.
    // Optimal: ab + cd (same piece count, smaller rank sum, no OOV).
    val ranks = Map("ab" -> 1, "abc" -> 2, "cd" -> 3)
    val (pieces, oov, rsum) = WordPiece.viterbiSegment("abcd", ranks, 3, fallbackRank = 4)
    assert(pieces.toSeq == Seq("ab", "cd") && oov == 0 && rsum == 4L)
    val (greedy, goov) = WordPiece.maxMatch("abcd", ranks.keySet, 3)
    assert(greedy.toSeq == Seq("abc", "d") && goov == 1)
  }

  test("viterbiSegment minimizes piece count before rank sum") {
    // "aaaa": vocab aaaa(9), a(1). One rank-9 piece beats four rank-1s.
    val ranks = Map("aaaa" -> 9, "a" -> 1)
    val (pieces, oov, rsum) = WordPiece.viterbiSegment("aaaa", ranks, 4, fallbackRank = 10)
    assert(pieces.toSeq == Seq("aaaa") && oov == 0 && rsum == 9L)
  }

  test("viterbiSegment fails LOUDLY when the count weight cannot dominate the rank sum") {
    // The DP's "fewest pieces first" ordering holds only while
    // fallbackRank * wordLength < 100000 (the count weight). A BERT-scale
    // vocabulary (~30k ranks) on a 20-char word breaks the bound — the
    // guard must throw, never silently reorder segmentations (VERDICT r15
    // item 2 / ADVICE r14).
    val bigVocab = (1 to 30000).map(i => f"p$i%05d" -> i).toMap // ranks 1..30000
    val word = "a" * 20 // 30001 * 20 = 600020 >= 100000
    val ex = intercept[IllegalArgumentException] {
      WordPiece.viterbiSegment(word, bigVocab, 5, fallbackRank = 30001)
    }
    assert(ex.getMessage.contains("dominance"), ex.getMessage)
    // and the public entry point surfaces it too (fallbackRank derives
    // from max rank + 1 inside viterbiEncode)
    val df = Seq((1L, word)).toDF("doc_id", "text")
    val thrown = intercept[org.apache.spark.SparkException] {
      WordPiece.viterbiEncode(df, "text", "doc_id", bigVocab.toSeq, maxPieceLen = 5)
        .collect()
    }
    assert(thrown.getMessage.contains("dominance") ||
      Option(thrown.getCause).exists(_.getMessage.contains("dominance")),
      s"expected the dominance require to surface, got: ${thrown.getMessage}")
    // the bound is tight the safe side: 4999 ranks on a 20-char word
    // (5000 * 20 = 100000 is the first violation; 4999 * 20 stays under)
    val okVocab = Map("aa" -> 1)
    val (pieces, _, _) = WordPiece.viterbiSegment(word, okVocab, 5, fallbackRank = 4999)
    assert(pieces.toSeq == Seq.fill(10)("aa"))
  }

  test("viterbiSegment falls back per character and counts OOV") {
    val ranks = Map("b" -> 1)
    val (pieces, oov, rsum) = WordPiece.viterbiSegment("xbz", ranks, 2, fallbackRank = 2)
    assert(pieces.toSeq == Seq("x", "b", "z") && oov == 2 && rsum == 2L + 1L + 2L)
  }

  test("viterbiEncode stitches per document and accounts ranks") {
    val df = Seq((1L, "abcd b"), (2L, "zz")).toDF("doc_id", "text")
    val got = WordPiece.viterbiEncode(df, "text", "doc_id",
        Seq("ab" -> 1, "abc" -> 2, "cd" -> 3, "b" -> 4), maxPieceLen = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 1: abcd -> ab cd (ranks 1+3), b -> b (rank 4); doc 2: z z fallback rank 5
    assert(got == Seq(
      (1L, 3L, 0L, 8L, "ab cd b"),
      (2L, 2L, 2L, 10L, "z z")))
  }

  test("mergeCounts: incremental vocab == full retrain (additive counts)") {
    val all = Seq((1L, "aa ab aa"), (2L, "ab bb cc"), (3L, "aa cc cc")).toDF("doc_id", "text")
    val stored = WordPiece.substringCounts(all.where(col("doc_id") <= 2), "text", 2)
    val inc = WordPiece.substringCounts(all.where(col("doc_id") > 2), "text", 2)
    val merged = WordPiece.vocabFromCounts(WordPiece.mergeCounts(stored, inc), 8)
      .as[(String, Long, Long)].collect().toSeq.sorted
    val full = WordPiece.induceVocab(all, "text", 2, 8)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(merged == full)
  }

  test("mergeCounts handles increment-only and stored-only pieces") {
    val stored = Seq(("x", 3L), ("y", 1L)).toDF("piece", "cnt")
    val inc = Seq(("y", 2L), ("z", 5L)).toDF("piece", "cnt")
    val got = WordPiece.mergeCounts(stored, inc)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 3L, "y" -> 3L, "z" -> 5L))
  }

  test("graft_wordpiece_vocab SQL table function plans as the Column API") {
    graft.GraftTableFunctions.all.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }
    Seq((1L, "ab ab cd")).toDF("doc_id", "text").createOrReplaceTempView("wp_docs_v")
    val sqlDf = spark.sql(
      "SELECT * FROM graft_wordpiece_vocab('wp_docs_v', 'text', 2, 3)")
    val apiDf = WordPiece.induceVocab(spark.table("wp_docs_v"), "text", 2, 3)
    assert(sqlDf.queryExecution.optimizedPlan
        .sameResult(apiDf.queryExecution.optimizedPlan),
      "SQL wordpiece_vocab must plan as the Column API")
    assert(sqlDf.orderBy("rank").collect().map(_.toString).toSeq ==
      apiDf.orderBy("rank").collect().map(_.toString).toSeq)
  }

  test("rejects non-positive parameters") {
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException] { WordPiece.substringCounts(df, "text", 0) }
    intercept[IllegalArgumentException] { WordPiece.induceVocab(df, "text", 2, 0) }
  }
}
