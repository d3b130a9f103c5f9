package graft.functions

import graft.SparkTestBase
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the fused per-document MinHash kernel ([[MinHashSigsMd5]], the r16
  * optimization of Dedup.minhashSignaturesMd5) bit-identical to the
  * relational formulation it replaced — explodedShingles → md5-prefix
  * affine maps → 64-way min aggregation — including every tokenize edge
  * case the WordShingles contract carries.
  */
class MinHashSigsMd5Spec extends SparkTestBase {
  import spark.implicits._

  /** The pre-r16 relational formulation, kept here as the reference. */
  private def relationalSigs(df: org.apache.spark.sql.DataFrame,
                             numHashes: Int, shingleK: Int) = {
    val P = 2147483647L
    val exploded = TextAnalysis.explodedShingles(df, "text", "doc_id", shingleK)
      .withColumn("__h", conv(substring(md5(col("__sh")), 1, 7), 16, 10).cast("long"))
    val aggs = (0 until numHashes).map { i =>
      val (a, b) = Dedup.minhashMd5Coeffs(i)
      min((col("__h") * a + b) % P).as(s"mh$i")
    }
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // > k words
    (2L, "alpha beta gamma delta epsilon"),              // exactly k for k=5
    (3L, "one two"),                                     // shorter than k: one truncated shingle
    (4L, "single"),                                      // one word
    (5L, ""),                                            // empty text: one "" shingle
    (6L, "  MiXeD   Case\twhite  space  "),              // trim + lowercase + \s+ split
    (7L, "naïve café über straße"),                      // multibyte
    (8L, null.asInstanceOf[String])                      // null text: excluded
  ).toDF("doc_id", "text")

  test("fused kernel equals the relational min-agg formulation on every edge case") {
    for ((nh, k) <- Seq((64, 5), (8, 3), (4, 1))) {
      val fused = Dedup.minhashSignaturesMd5(corpus, "text", "doc_id", nh, k)
        .orderBy("doc_id").collect().map(_.toSeq)
      val ref = relationalSigs(corpus, nh, k)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(fused.toSeq == ref.toSeq, s"divergence at numHashes=$nh k=$k")
    }
  }

  test("null-text documents get no signature row (explodedShingles contract)") {
    val ids = Dedup.minhashSignaturesMd5(corpus, "text", "doc_id", 8, 5)
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("the kernel runs ONCE per row: no Generate, no aggregate, one expression instance") {
    // parquet-backed input: a local relation would be constant-folded into
    // a LocalTableScan at plan time and the assertion would be vacuous
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.minhashSignaturesMd5(docs, "text", "doc_id", 64, 5)
      .queryExecution.executedPlan.toString
    assert("minhash_sigs_md5".r.findAllIn(plan).size == 1,
      s"expected exactly one kernel eval in the plan (CollapseProject must not " +
        s"inline the 64-reference alias):\n$plan")
    assert(!plan.contains("HashAggregate"), "signature stage regressed to an aggregation")
    assert(!plan.contains("Generate"), "signature stage regressed to a shingle explode")
  }
}
