package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RerankSpec extends SparkTestBase {
  import spark.implicits._

  test("greedyMmr: rank 1 is the relevance argmax; later picks trade redundancy") {
    // three candidates: A highly relevant, B nearly identical to A but a
    // touch less relevant, C orthogonal to A with modest relevance.
    // Pure relevance would order A, B, C; MMR must demote the near-copy B.
    val a = Array(1.0, 0.0, 0.0)
    val b = Array(0.999, 0.01, 0.0)
    val c = Array(0.0, 1.0, 0.0)
    val cands = Array((10L, 0.95, a), (20L, 0.94, b), (30L, 0.60, c))
    val picked = Rerank.greedyMmr(cands, lambda = 0.5, k = 3)
    assert(picked === Seq(10L, 30L, 20L), "MMR must pick the orthogonal C before the near-copy B")
  }

  test("greedyMmr: lambda=1 reduces to pure relevance order; ties break on lower id") {
    val v = Array(1.0, 0.0)
    val cands = Array((3L, 0.5, v), (1L, 0.9, v), (2L, 0.5, v))
    assert(Rerank.greedyMmr(cands, lambda = 1.0, k = 3) === Seq(1L, 2L, 3L))
    // fewer candidates than k: stops at the list, no invention
    assert(Rerank.greedyMmr(cands.take(1), lambda = 0.5, k = 5) === Seq(3L))
  }

  test("mmrSelect distributes the same greedy: matches local result on sf0.001, partition-invariant") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(pmod(col("vec_id"), lit(50)) === 0)
    val out = Rerank.mmrDiversifyTopK(queries, emb, "embedding", "vec_id",
      m = 10, k = 3, lambda = 0.5)
    val rows = out.collect()
    val nQueries = queries.count()
    assert(rows.length === 3 * nQueries, "every query yields exactly k picks")
    // per-query: rank-1 equals the brute-force rank-1 (pure relevance first pick)
    val top1 = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    rows.filter(_.getAs[Long]("mmr_rank") == 1L).foreach { r =>
      assert(top1(r.getAs[Long]("query_id")) === r.getAs[Long]("neighbor_id"))
    }
    // picks are distinct per query
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("neighbor_id")).distinct.length === g.length)
    }
    // partition invariance (the greedy is a pure per-group function)
    val again = Rerank.mmrDiversifyTopK(queries.repartition(7), emb.repartition(13),
      "embedding", "vec_id", m = 10, k = 3, lambda = 0.5).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("rank eval: perfect self-comparison; planted miss scores correctly") {
    val exact = Seq((1L, 1L, 100L), (1L, 2L, 200L), (2L, 1L, 300L), (2L, 2L, 400L))
      .toDF("qid", "rnk", "nid")
    // approx for q1 matches exactly; q2's list missed the true top-1 and
    // found only one of two truth rows
    val approx = Seq((1L, 1L, 100L), (1L, 2L, 200L), (2L, 1L, 400L), (2L, 2L, 999L))
      .toDF("qid", "rnk", "nid")
    val out = RankEval.vsExact(approx, exact, "qid", "rnk", "nid").collect()
    val byQ = out.map(r => r.getAs[Long]("qid") -> r).toMap
    assert(byQ(1L).getAs[Long]("n_overlap") === 2L)
    assert(byQ(1L).getAs[Double]("recall_at_k") === 1.0)
    assert(byQ(1L).getAs[Double]("rr") === 1.0, "exact top-1 found at approx rank 1")
    assert(byQ(2L).getAs[Long]("n_overlap") === 1L)
    assert(byQ(2L).getAs[Double]("recall_at_k") === 0.5)
    assert(byQ(2L).getAs[Double]("rr") === 0.0, "exact top-1 absent from approx → rr 0")
  }

  test("rank eval on real rankings: LSH recall against brute force is within [0,1] and self-eval is 1") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(pmod(col("vec_id"), lit(50)) === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "embedding", "vec_id", 5)
    val self = RankEval.vsExact(exact, exact, "query_id", "rank", "neighbor_id").collect()
    assert(self.forall(_.getAs[Double]("recall_at_k") === 1.0))
    assert(self.forall(_.getAs[Double]("rr") === 1.0))
    val approx = Similarity.lshTopKDet(queries, emb, "embedding", "vec_id",
      k = 5, planes = 6, dim = 64)
    val eval = RankEval.vsExact(approx, exact, "query_id", "rank", "neighbor_id").collect()
    assert(eval.length === queries.count())
    eval.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_exact"))
    }
  }

  test("LSH-MMR (q179 form): rank 1 is the bucket-candidate relevance argmax; greedy matches the exact form on shared candidates") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = emb.where(pmod(col("vec_id"), lit(50)) === 0)
    val lshMmr = Rerank.mmrDiversifyTopKLsh(anchors, emb, "embedding", "vec_id",
      m = 10, k = 3, lambda = 0.5, planes = 6, dim = 64)
    val top = Similarity.lshTopKDet(anchors, emb, "embedding", "vec_id",
      k = 10, planes = 6, dim = 64)
    val rank1Mmr = lshMmr.where(col("mmr_rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rank1Lsh = top.where(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rank1Mmr.nonEmpty && rank1Mmr === rank1Lsh,
      "MMR rank 1 must be the relevance argmax of the SAME bucket candidates")
    // every selected neighbor must come from the LSH candidate set
    val candSet = top.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val picked = lshMmr.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(picked.forall(candSet.contains))
  }
}
