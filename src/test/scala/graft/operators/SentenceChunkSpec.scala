package graft.operators

import graft.SparkTestBase

class SentenceChunkSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-traced packing: floor(before/budget) assignment, no mid-sentence split") {
    // sentences of 3, 4, 2, 5 tokens, budget 6:
    //   before: 0, 3, 7, 9 → chunks 0, 0, 1, 1
    val text = "one two three. four five six seven! eight nine? ten eleven twelve thirteen fourteen."
    val out = TextAnalysis.sentenceChunks(Seq((1L, text)).toDF("id", "t"), "t", "id",
        tokenBudget = 6)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(0L) === ((2L, 7L, "one two three four five six seven")),
      "chunk 0 exceeds the budget by its LAST sentence, never splits it")
    assert(out(1L) === ((2L, 7L, "eight nine ten eleven twelve thirteen fourteen")))
  }

  test("terminator runs and trailing punctuation normalize; empty fragments drop") {
    val out = TextAnalysis.sentenceChunks(
        Seq((1L, "  a b!!  c d...  e f?  ")).toDF("id", "t"), "t", "id", 100)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(4) === "a b c d e f")
    assert(out.head.getLong(2) === 3L && out.head.getLong(3) === 6L)
  }

  test("a single long sentence still lands whole in one chunk") {
    val long = (1 to 20).map(i => s"w$i").mkString(" ") + "."
    val out = TextAnalysis.sentenceChunks(Seq((1L, long)).toDF("id", "t"), "t", "id", 5)
      .collect()
    assert(out.length === 1 && out.head.getLong(3) === 20L)
  }

  test("invariant to input partitioning; null docs drop") {
    val docs = ((1L to 30L).map(i => (i, s"s$i one two. s$i three four five. s$i six.")) ++
      Seq((99L, null.asInstanceOf[String]))).toDF("id", "t")
    val a = TextAnalysis.sentenceChunks(docs.repartition(7), "t", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    val b = TextAnalysis.sentenceChunks(docs, "t", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(a === b && !a.exists(_._1 == 99L))
  }
}
