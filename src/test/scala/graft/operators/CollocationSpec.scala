package graft.operators

import graft.SparkTestBase

class CollocationSpec extends SparkTestBase {
  import spark.implicits._

  // "new york" dominates the corpus → high PMI; filler words are spread
  private def corpus(extra: Seq[(Long, String)] = Nil) =
    (((1L to 12L).map(i => (i, s"new york f$i g$i")) ++ extra): Seq[(Long, String)])
      .toDF("doc_id", "text")

  test("greedy leftmost non-overlapping merge: 'a b c' with both pairs phrased") {
    // force (w1,w2) and (w2,w3) both into the inventory, then a doc with
    // the triple: greedy merges (w1,w2), leaves w3
    val docs = ((1L to 10L).map(i => (i, "w1 w2 x" + i)) ++
      (11L to 20L).map(i => (i, "w2 w3 y" + i)) ++
      Seq((21L, "w1 w2 w3"))).toDF("doc_id", "text")
    val out = TextAnalysis.mergeCollocations(docs, "text", "doc_id",
        minPairCount = 5, minPmi = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(21L) === ((3L, 1L, "w1_w2 w3")))
    assert(out(1L)._3.startsWith("w1_w2 "))
  }

  test("runs of even length merge fully; odd runs leave the tail token") {
    // four tokens all chained: (a,b),(b,a) both phrases → "a b a b" merges
    // at offsets 0 and 2 → "a_b a_b"
    val docs = ((1L to 10L).map(i => (i, "a b c" + i)) ++
      (11L to 20L).map(i => (i, "b a d" + i)) ++
      Seq((21L, "a b a b"), (22L, "a b a"))).toDF("doc_id", "text")
    val out = TextAnalysis.mergeCollocations(docs, "text", "doc_id", 5, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(21L) === ((2L, "a_b a_b")))
    assert(out(22L) === ((1L, "a_b a")))
  }

  test("support and PMI thresholds both gate the inventory") {
    // "new york" passes; "f1 g1" occurs once (support fails)
    val out = TextAnalysis.mergeCollocations(corpus(), "text", "doc_id", 5, 1.0)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "new_york f1 g1")
    // an absurd PMI threshold empties the inventory → identity rewrite
    val none = TextAnalysis.mergeCollocations(corpus(), "text", "doc_id", 5, 50.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(none(1L) === ((0L, "new york f1 g1")))
  }

  test("token accounting: n_tokens is the pre-merge count") {
    val out = TextAnalysis.mergeCollocations(corpus(), "text", "doc_id", 5, 1.0)
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) === 4L, "every corpus doc had 4 tokens")
      assert(r.getString(3).split(" ").length === (4L - r.getLong(2)).toInt)
    }
  }

  test("invariant to input partitioning") {
    val docs = corpus(Seq((100L, "new york new york")))
    val a = TextAnalysis.mergeCollocations(docs.repartition(7), "text", "doc_id", 5, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val b = TextAnalysis.mergeCollocations(docs, "text", "doc_id", 5, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(a === b)
    assert(b.exists(t => t._1 == 100L && t._4 == "new_york new_york"))
  }
}
