package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("shard addresses are a bijection: every row exactly one (shard, pos), positions dense per shard") {
    val out = Sharding.assignShards(docs.select("doc_id"), "doc_id", 8).cache()
    assert(out.count() === docs.count())
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("maxp"), min("pos").as("minp"),
        countDistinct("pos").as("np"))
      .collect()
    assert(perShard.length === 8)
    perShard.foreach { r =>
      assert(r.getAs[Long]("minp") === 1L)
      assert(r.getAs[Long]("maxp") === r.getAs[Long]("n"))
      assert(r.getAs[Long]("np") === r.getAs[Long]("n"))
    }
    out.unpersist()
  }

  test("assignment is invariant to input partitioning (reproducible export)") {
    val a = Sharding.assignShards(docs.select("doc_id"), "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sharding.assignShards(docs.select("doc_id").repartition(13), "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("the shuffle actually shuffles: within-shard order decorrelates from source order") {
    // Spearman-ish check: among consecutive doc_id pairs landing in the
    // same shard, their positions should be ~uncorrelated with id order —
    // an identity-ish mapping would keep almost all pairs ordered.
    val out = Sharding.assignShards(docs.select("doc_id"), "doc_id", 1)
      .orderBy("doc_id").collect().map(_.getLong(2))
    val ordered = out.sliding(2).count(p => p(1) > p(0))
    val frac = ordered.toDouble / (out.length - 1)
    assert(frac > 0.35 && frac < 0.65, s"adjacent-pair ordered fraction $frac")
  }

  test("shardStats balance: no shard deviates wildly from the mean") {
    val stats = Sharding.shardStats(docs, "doc_id", "text", 8).collect()
    val counts = stats.map(_.getAs[Long]("n_docs"))
    val mean = counts.sum.toDouble / counts.length
    counts.foreach(c => assert(math.abs(c - mean) < mean,
      s"shard with $c docs vs mean $mean"))
    val tokens = stats.map(_.getAs[Long]("n_tokens")).sum
    assert(tokens > 0)
  }
}
