package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("weights normalize to ~1 and budget splits to ~total") {
    val out = Mixture.alphaWeights(docs, "lang", "text", 0.5, 1000000L).collect()
    val wsum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val bsum = out.map(_.getAs[Long]("budget_tokens")).sum
    assert(math.abs(bsum - 1000000L) <= out.length, s"budgets sum to $bsum")
  }

  test("alpha < 1 up-weights the tail: smaller strata gain share vs proportional") {
    val out = Mixture.alphaWeights(docs, "lang", "text", 0.5, 1000000L).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"), r.getAs[Double]("weight")))
    val totalTokens = out.map(_._2).sum.toDouble
    val smallest = out.minBy(_._2)
    val largest = out.maxBy(_._2)
    assert(smallest._3 > smallest._2 / totalTokens,
      s"smallest stratum ${smallest._1} should gain share under alpha=0.5")
    assert(largest._3 < largest._2 / totalTokens,
      s"largest stratum ${largest._1} should lose share under alpha=0.5")
  }

  test("alpha = 1 reduces to proportional token share") {
    val out = Mixture.alphaWeights(docs, "lang", "text", 1.0, 1000000L).collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight")))
    val total = out.map(_._1).sum.toDouble
    out.foreach { case (n, w) =>
      assert(math.abs(w - n / total) < 1e-5, s"weight $w vs proportional ${n / total}")
    }
  }

  test("weights are invariant to input partitioning (decimal-exact normalizer)") {
    val a = Mixture.alphaWeights(docs, "lang", "text", 0.5, 1000000L)
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toSet
    val b = Mixture.alphaWeights(docs.repartition(17), "lang", "text", 0.5, 1000000L)
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toSet
    assert(a === b)
  }
}
