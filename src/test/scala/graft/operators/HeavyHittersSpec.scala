package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** deterministic pseudo-random token stream with planted skew */
  private def stream(n: Int, planted: Map[String, Int]): Seq[String] = {
    val rare = (0 until n).map(i => s"rare${(i * 2654435761L % 997).toInt}")
    val heavy = planted.toSeq.sortBy(_._1).flatMap { case (t, c) => Seq.fill(c)(t) }
    // deterministic interleave (no Random): position by multiplicative hash
    (rare ++ heavy).zipWithIndex
      .sortBy { case (t, i) => (i * 2654435761L + t.hashCode) }
      .map(_._1)
  }

  private def exactHitters(toks: Seq[String], k: Int): Seq[(String, Long)] = {
    val n = toks.size.toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * (k + 1) > n }
      .sortBy { case (t, c) => (-c, t) }
  }

  test("Misra–Gries kernel retains every token above the n/(k+1) guarantee") {
    for (k <- Seq(2, 5, 16)) {
      val toks = stream(400, Map("alpha" -> 300, "beta" -> 120, "gamma" -> 40))
      val survivors = HeavyHitters.misraGries(toks.iterator, k).keySet
      val must = exactHitters(toks, k).map(_._1).toSet
      assert(must.subsetOf(survivors),
        s"k=$k lost true heavy hitters: ${must.diff(survivors)}")
      assert(survivors.size <= k, s"k=$k summary exceeded k: ${survivors.size}")
    }
  }

  test("ofTokens == exact GROUP BY + HAVING, invariant to partitioning") {
    val toks = stream(600, Map("alpha" -> 500, "beta" -> 200, "gamma" -> 90))
    val want = exactHitters(toks, 8).zipWithIndex
      .map { case ((t, c), i) => (t, c, (i + 1).toLong) }
    assert(want.nonEmpty && want.size < 8) // the fixture actually exercises both sides
    for (parts <- Seq(1, 3, 7)) {
      val got = HeavyHitters.ofTokens(
          toks.toDF("tok").repartition(parts), "tok", k = 8)
        .orderBy("rank").as[(String, Long, Long)].collect().toSeq
      assert(got == want, s"parts=$parts got=$got want=$want")
    }
  }

  test("no token above the 1/(k+1) share means an empty result") {
    val toks = (0 until 300).map(i => s"t${i % 50}") // 50 tokens × 6 each
    val got = HeavyHitters.ofTokens(toks.toDF("tok"), "tok", k = 4)
    assert(got.count() == 0) // 6 * 5 = 30 <= 300
  }

  test("ofText lowers, trims, and splits on whitespace runs") {
    val docs = Seq(
      (1L, "  The THE the\tthe  "),
      (2L, "the miss"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = HeavyHitters.ofText(docs, "text", k = 2)
      .as[(String, Long, Long)].collect().toSeq
    // 7 tokens total: the×5, miss×1; threshold cnt*3 > 6 keeps only "the"
    assert(got == Seq(("the", 5L, 1L)), got.toString)
  }

  test("rejects non-positive k") {
    intercept[IllegalArgumentException] {
      HeavyHitters.ofTokens(Seq("a").toDF("tok"), "tok", 0)
    }
  }
}
