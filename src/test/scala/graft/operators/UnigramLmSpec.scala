package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference for the E-step: enumerate EVERY segmentation
    * of the word into vocabulary pieces, weight each path by
    * Π p3ᵢ·1000^(lᵢ-1) — the numerator of Π(p3ᵢ/1000) over the common
    * denominator 1000^n, so paths with different piece counts compare
    * correctly — and compute each piece's expected count as the weighted
    * occurrence sum over paths divided by the total path weight, in
    * integer billionths with the same ⌊(2n+d)/(2d)⌋ rounding. The kernel
    * computes the identical quantity by forward/backward DP; any
    * alpha/beta indexing or scaling bug shows up as a mismatch here.
    */
  private def bruteExpected(word: String, prob3: Map[String, Long],
                            maxPieceLen: Int): Map[String, Long] = {
    def paths(p: Int): Seq[(List[String], BigInt)] =
      if (p == word.length) Seq((Nil, BigInt(1)))
      else (1 to math.min(maxPieceLen, word.length - p)).flatMap { l =>
        val piece = word.substring(p, p + l)
        prob3.get(piece).filter(_ > 0).toSeq.flatMap { w =>
          val ew = BigInt(w) * BigInt(1000).pow(l - 1)
          paths(p + l).map { case (rest, pw) => (piece :: rest, pw * ew) }
        }
      }
    val all = paths(0)
    if (all.isEmpty) return Map.empty
    val z = all.map(_._2).sum
    val num = scala.collection.mutable.HashMap.empty[String, BigInt]
    all.foreach { case (pieces, w) =>
      pieces.foreach(pc => num.update(pc, num.getOrElse(pc, BigInt(0)) + w))
    }
    num.map { case (pc, nm) =>
      pc -> ((nm * 1000000000L * 2 + z) / (z * 2)).toLong
    }.toMap
  }

  test("expectedCounts matches brute-force path enumeration") {
    val prob3 = Map("a" -> 300L, "b" -> 150L, "ab" -> 400L, "ba" -> 50L,
      "aba" -> 90L, "c" -> 10L)
    for (word <- Seq("a", "ab", "aba", "abab", "ababa", "cabab", "abcba")) {
      val got = UnigramLm.expectedCounts(word, prob3, maxPieceLen = 3).toMap
      assert(got == bruteExpected(word, prob3, 3), s"word=$word")
    }
  }

  test("expectedCounts: per-word expected piece total is between 1 and word length") {
    val prob3 = Map("a" -> 500L, "b" -> 300L, "ab" -> 200L, "bb" -> 100L)
    for (word <- Seq("ab", "abb", "bbab", "aabba")) {
      val total = UnigramLm.expectedCounts(word, prob3, 2).map(_._2).sum
      // Σ γ9 = expected number of pieces in a random segmentation, in
      // billionths — at least 1 piece, at most one per character (each
      // γ9 rounds independently, hence the ±#pieces quantum slack)
      val slack = prob3.size
      assert(total >= 1000000000L - slack && total <= word.length * 1000000000L + slack,
        s"word=$word total=$total")
    }
  }

  test("expectedCounts: word with an out-of-vocabulary character contributes nothing") {
    assert(UnigramLm.expectedCounts("axb", Map("a" -> 500L, "b" -> 500L), 2).isEmpty)
  }

  test("initProb3 floors at one quantum and rounds half-up") {
    val p = UnigramLm.initProb3(Seq("a" -> 1L, "b" -> 1999L, "c" -> 2000000L))
    // total=2002000: a -> 1000/2002000 rounds to 0 -> floored to 1
    assert(p("a") == 1L)
    assert(p("b") == ((BigInt(1999) * 1000 * 2 + 2002000) / (2 * 2002000)).toLong)
    assert(p("c") == ((BigInt(2000000) * 1000 * 2 + 2002000) / (2 * 2002000)).toLong)
  }

  test("train keeps the full seed vocabulary with p3 >= 1") {
    val docs = Seq((1L, "abab baba ab"), (2L, "bb aa abab"), (3L, "cab ab"))
      .toDF("doc_id", "text")
    val t = UnigramLm.train(docs, "text", maxPieceLen = 3, seedSize = 6, iters = 2)
      .collect()
    val seedPieces = UnigramLm.seedCounts(docs, "text", 3, 6)
      .select("piece").as[String].collect().toSet
    assert(t.map(_.getString(0)).toSet == seedPieces)
    assert(t.forall(_.getLong(1) >= 1L))
    // every occurring single character survives seeding (coverage)
    assert(Set("a", "b", "c").subsetOf(seedPieces))
  }

  test("EM shifts probability mass toward the dominant piece") {
    // corpus is almost entirely "abab": the piece 'ab' should end up more
    // probable than the single characters after EM
    val docs = Seq((1L, "abab abab abab abab abab ab ab ab c")).toDF("doc_id", "text")
    val t = UnigramLm.train(docs, "text", maxPieceLen = 2, seedSize = 4, iters = 2)
      .select("piece", "p3").as[(String, Long)].collect().toMap
    assert(t("ab") > t("a") && t("ab") > t("b"), s"got $t")
  }

  test("prune keeps top-k by expected count plus all single chars, and nests monotonically") {
    val docs = Seq((1L, "abab baba caba bc abc ab ba"), (2L, "aa bb cc abc bac"))
      .toDF("doc_id", "text")
    val trained = UnigramLm.train(docs, "text", maxPieceLen = 3, seedSize = 12, iters = 2)
      .cache()
    val kept = Seq(2, 4, 8, 11).map { k =>
      k -> UnigramLm.prune(trained, keep = k).select("piece").as[String].collect().toSet
    }
    // single-char coverage at every k
    kept.foreach { case (k, s) =>
      assert(Set("a", "b", "c").subsetOf(s), s"k=$k lost a single char")
    }
    // monotone nesting: the kept set at k is a subset of the kept set at k' > k
    kept.sliding(2).foreach {
      case Seq((k1, s1), (k2, s2)) =>
        assert(s1.subsetOf(s2), s"prune($k1) must nest inside prune($k2)")
      case _ =>
    }
    // ranks are dense 1..m in (e9 desc, piece asc) order
    val ranked = UnigramLm.prune(trained, keep = 4)
      .orderBy("rank").select("rank").as[Long].collect().toSeq
    assert(ranked == (1L to ranked.size).toSeq)
    trained.unpersist()
  }

  test("viterbiSegment3 finds the max-weight path (brute-force parity) with shortest-piece ties") {
    val prob3 = Map("a" -> 300L, "b" -> 150L, "ab" -> 400L, "ba" -> 50L,
      "aba" -> 90L, "c" -> 10L)
    def bruteBest(word: String, maxPieceLen: Int): (BigInt, Int) = {
      def paths(p: Int): Seq[(Int, BigInt)] =
        if (p == word.length) Seq((0, BigInt(1)))
        else (1 to math.min(maxPieceLen, word.length - p)).flatMap { l =>
          val piece = word.substring(p, p + l)
          val w = prob3.get(piece).filter(_ > 0)
            .map(v => BigInt(v) * BigInt(1000).pow(l - 1))
            .getOrElse(if (l == 1 && !prob3.get(piece).exists(_ > 0)) BigInt(1) else BigInt(0))
          if (w.signum == 0) Nil
          else paths(p + l).map { case (k, pw) => (k + 1, pw * w) }
        }
      paths(0).maxBy(_._2) match { case (k, w) => (w, k) }
    }
    for (word <- Seq("ab", "aba", "abab", "ababa", "cabab", "axb")) {
      val (pieces, _, weight) = UnigramLm.viterbiSegment3(word, prob3, 3)
      val (bw, _) = bruteBest(word, 3)
      assert(weight == bw, s"word=$word weight=$weight brute=$bw")
      assert(pieces.mkString("") == word, s"word=$word pieces must tile the word")
    }
    // deterministic tie: "ab" with p3(ab)=p3(a)*p3(b)/1000 scaled equal —
    // w(ab)=400*1000 vs w(a)*w(b)=300*150=45000: ab wins outright here;
    // construct a true tie instead: x/y singles 100 each vs "xy" 10:
    // w(xy)=10*1000=10000, w(x)*w(y)=10000 — equal; shortest piece wins
    val tie = Map("x" -> 100L, "y" -> 100L, "xy" -> 10L)
    val (tp, to2, _) = UnigramLm.viterbiSegment3("xy", tie, 2)
    assert(tp.toSeq == Seq("x", "y") && to2 == 0)
  }

  test("viterbiSegment3 flags OOV fallback chars and never double-generates vocab chars") {
    val prob3 = Map("a" -> 500L, "b" -> 500L)
    val (pieces, oov, weight) = UnigramLm.viterbiSegment3("axb", prob3, 2)
    assert(pieces.toSeq == Seq("a", "x", "b") && oov == 1)
    // weight = 500 * 1 * 500
    assert(weight == BigInt(500) * 1 * 500)
  }

  test("incremental==full: training from merged stored+increment counts equals the full retrain") {
    val stored = Seq((1L, "abab baba ab"), (2L, "bb aa abab")).toDF("doc_id", "text")
    val inc = Seq((3L, "cab ab ababa"), (4L, "ba cc")).toDF("doc_id", "text")
    val full = stored.unionByName(inc)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("piece", "p3", "e9").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toBigInteger)).sorted.toSeq
    val fullTrain = key(UnigramLm.train(full, "text", maxPieceLen = 3,
      seedSize = 8, iters = 2))
    val mergedPieces = WordPiece.mergeCounts(
      WordPiece.substringCounts(stored, "text", 3),
      WordPiece.substringCounts(inc, "text", 3))
    val mergedWords = UnigramLm.mergeWordCounts(
      Bpe.wordTable(stored, "text").select(col("word"), col("cnt")),
      Bpe.wordTable(inc, "text").select(col("word"), col("cnt")))
    val incTrain = key(UnigramLm.trainFromCounts(mergedPieces, mergedWords,
      maxPieceLen = 3, seedSize = 8, iters = 2))
    assert(incTrain == fullTrain)
  }

  test("E-step plan: one shuffle (piece aggregation) with partial aggregation pushed map-side") {
    val docs = Seq((1L, "abab ab"), (2L, "ba ab")).toDF("doc_id", "text")
    val words = Bpe.wordTable(docs, "text").select(col("word"), col("cnt"))
    val prob3 = Map("a" -> 400L, "b" -> 400L, "ab" -> 200L)
    // drive emIterate once; the assertion is on the result (the plan is a
    // Dataset flatMap + groupBy sum — partial aggregation is Spark's
    // default for sum, pinned by the exchange count in PlanInvariantSpec
    // patterns elsewhere); here we pin numeric exactness instead
    val (e9, next) = UnigramLm.emIterate(words, prob3, maxPieceLen = 2)
    val tot = e9.map(_._2).sum
    assert(tot.signum > 0)
    // M-step rounding: p3 sums over pieces stay near 1000 (each piece
    // rounds independently; drift bounded by vocab size)
    val psum = next.values.sum
    assert(psum >= 1000L - next.size && psum <= 1000L + next.size, s"psum=$psum")
  }
}
