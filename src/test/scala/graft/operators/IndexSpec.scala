package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("postings on a known corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "THE  cat")
    ).toDF("doc_id", "text")
    val out = Index.invertedIndex(df, "text", "doc_id").collect()
      .map(r => (r.getAs[String]("term"),
        (r.getAs[Long]("doc_freq"), r.getAs[Long]("term_freq"), r.getAs[String]("postings"))))
      .toMap
    assert(out("the") === ((3L, 3L, "1,2,3")))
    assert(out("cat") === ((2L, 2L, "1,3")))
    assert(out("sat") === ((2L, 2L, "1,2")))
    assert(out("dog") === ((1L, 1L, "2")))
  }

  test("minDf drops the hapax tail and maxPostings truncates head terms") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, s"common unique$i")).toDF("doc_id", "text")
    val out = Index.invertedIndex(df, "text", "doc_id", minDf = 2, maxPostings = 5)
    val rows = out.collect()
    assert(rows.length === 1) // only "common" survives minDf=2
    val r = rows.head
    assert(r.getAs[String]("term") === "common")
    assert(r.getAs[Long]("doc_freq") === 30L)
    assert(r.getAs[String]("postings") === "1,2,3,4,5") // sorted THEN truncated
  }

  test("invariants on the real corpus: df <= tf, postings sorted ascending") {
    val out = Index.invertedIndex(docs, "text", "doc_id", minDf = 2, maxPostings = 20)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df0 = r.getAs[Long]("doc_freq"); val tf = r.getAs[Long]("term_freq")
      assert(df0 <= tf, s"term ${r.getAs[String]("term")}")
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length === math.min(df0, 20L).toInt)
      assert(ids.sameElements(ids.sorted), s"unsorted postings for ${r.getAs[String]("term")}")
    }
  }

  test("result is invariant to input partitioning") {
    val a = Index.invertedIndex(docs, "text", "doc_id", minDf = 2, maxPostings = 20)
    val b = Index.invertedIndex(docs.repartition(13), "text", "doc_id", minDf = 2, maxPostings = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
