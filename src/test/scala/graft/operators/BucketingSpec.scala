package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("approx buckets deviate from the exact ntile split only at cutoff edges") {
    // the real q82 signal: corpus unigram-LM scores
    val lm = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
    val approx = Bucketing.byApproxQuantilesDesc(lm, "avg_logprob", 3)
    val exact = lm.withColumn("bucket",
      ntile(3).over(Window.orderBy(col("avg_logprob").desc, col("doc_id"))).cast("long"))
    val joined = approx.select(col("doc_id"), col("bucket").as("b_approx"))
      .join(exact.select(col("doc_id"), col("bucket").as("b_exact")), "doc_id")
    val n = joined.count()
    val disagree = joined.where(col("b_approx") =!= col("b_exact")).count()
    assert(n === docs.count())
    // high accuracy + continuous scores: disagreement is a thin edge band
    assert(disagree.toDouble / n < 0.02, s"$disagree of $n rows moved buckets")
    // buckets are ordered: every bucket-1 score >= every bucket-3 score
    val stats = approx.groupBy("bucket")
      .agg(min("avg_logprob").as("mn"), max("avg_logprob").as("mx"))
      .collect().map(r => r.getAs[Long]("bucket") -> (r.getAs[Double]("mn"), r.getAs[Double]("mx"))).toMap
    assert(stats(1L)._1 >= stats(2L)._2 || math.abs(stats(1L)._1 - stats(2L)._2) < 1e-12)
    assert(stats(2L)._1 >= stats(3L)._2 || math.abs(stats(2L)._1 - stats(3L)._2) < 1e-12)
  }

  test("no global-sort window in the approx plan") {
    val lm = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
    val plan = Bucketing.byApproxQuantilesDesc(lm, "avg_logprob", 3)
      .queryExecution.executedPlan.toString
    // ntile would appear as a Window over an empty partition spec; the
    // approx path must have no Window node at all downstream of the LM agg
    // ("ntile(" not "ntile" — percentile_approx contains the substring)
    assert(!plan.contains("ntile("), "approx bucketing regressed to ntile")
    assert(!plan.contains("Window "), "approx bucketing plans a Window node")
  }

  test("q177 (the registered scale sibling of q82) runs the approx plan, not ntile") {
    val df = graft.SparkEntry.queries("q177_lm_buckets_approx")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile("), "registered q177 regressed to the exact ntile form")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("bucket")).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
  }

  test("bucket report shape matches q82's rollup") {
    val lm = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
    val rep = Bucketing.bucketReport(
      Bucketing.byApproxQuantilesDesc(lm, "avg_logprob", 3),
      "avg_logprob", weightCol = Some(col("n_tokens"))).collect()
    assert(rep.map(_.getAs[Long]("bucket")).toSeq === Seq(1L, 2L, 3L))
    val total = rep.map(_.getAs[Long]("n_docs")).sum
    assert(total === docs.count())
    // roughly even thirds
    rep.foreach { r =>
      val frac = r.getAs[Long]("n_docs").toDouble / total
      assert(frac > 0.25 && frac < 0.42, s"bucket ${r.getAs[Long]("bucket")}: $frac")
    }
  }
}
