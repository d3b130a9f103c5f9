package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkTestBase {

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("every vector is assigned to exactly one centroid") {
    val assigned = Clustering.assignToSeedCentroids(embeddings, "embedding", "vec_id", 8)
    assert(assigned.count() === embeddings.count())
    assert(assigned.select("__vid").distinct().count() === embeddings.count())
    // cluster ids are the 8 seed ids
    val seeds = embeddings.orderBy("vec_id").limit(8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val cids = assigned.select("__cid").distinct().collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf(seeds))
  }

  test("lloydStep member counts are consistent across dims and sum to the corpus") {
    val step = Clustering.lloydStep(embeddings, "embedding", "vec_id", 8).cache()
    // within a cluster, every dim sees the same member count
    val inconsistent = step.groupBy("cluster_id")
      .agg(countDistinct("n_members").as("k"))
      .where(col("k") =!= 1).count()
    assert(inconsistent === 0L)
    // per-cluster members sum to corpus size; 64 dims each
    val perCluster = step.groupBy("cluster_id")
      .agg(max("n_members").as("m"), count(lit(1)).as("dims"))
    assert(perCluster.agg(sum("m")).head.getLong(0) === embeddings.count())
    assert(perCluster.where(col("dims") =!= 64).count() === 0L)
    step.unpersist()
  }

  test("known corpus: merged cluster averages, singleton keeps its vector") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // numCentroids=2 → seeds are vectors 1 and 2. Vector 1 → seed 1
    // (cos 1.0), vector 2 → seed 2 (cos 1.0), vector 3 → seed 2
    // (cos(3,2)=0.1105 > cos(3,1)=0): cluster 1 = {1}, cluster 2 = {2,3}
    val step = Clustering.lloydStep(df, "embedding", "vec_id", numCentroids = 2)
    val byCluster = step.collect().groupBy(_.getAs[Long]("cluster_id"))
    val c1 = byCluster(1L).sortBy(_.getAs[Long]("dim"))
    assert(c1.forall(_.getAs[Long]("n_members") === 1L))
    assert(c1.map(_.getAs[Double]("centroid")).toSeq === Seq(1.0, 0.0))
    val c2 = byCluster(2L).sortBy(_.getAs[Long]("dim"))
    assert(c2.forall(_.getAs[Long]("n_members") === 2L))
    // mean of (0.9f, 0.0f) and (0.1f, 1.0f) per dim, rounded to 6
    assert(c2.map(_.getAs[Double]("centroid")).toSeq === Seq(0.45, 0.55))
  }

  test("decimal-quantized means are invariant to input partitioning") {
    val a = Clustering.lloydStep(embeddings, "embedding", "vec_id", 8)
    val b = Clustering.lloydStep(embeddings.repartition(17), "embedding", "vec_id", 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("label prototypes: one per label, dim-ordered, partition-invariant") {
    val protos = Clustering.labelPrototypes(embeddings, "embedding", "label").collect()
    val labels = embeddings.select("label").distinct().count()
    assert(protos.length === labels, "exactly one prototype per label")
    protos.foreach(r => assert(r.getSeq[Double](1).length === 64))
    // a prototype dimension is the decimal-exact member mean of that dim
    val l0 = protos.map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val members0 = embeddings.where(col("label") === 0)
      .select("embedding").collect().map(_.getSeq[Float](0))
    val dim0Mean = members0.map(v => BigDecimal(v(0).toDouble.toString).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / members0.length
    assert(l0(0)(0) === BigDecimal(dim0Mean.toString).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = Clustering.labelPrototypes(embeddings.repartition(17), "embedding", "label")
    assert(Clustering.labelPrototypes(embeddings, "embedding", "label")
      .exceptAll(b).isEmpty)
  }

  test("nearest-prototype confusion: cells partition the corpus, diagonal beats chance") {
    val conf = Clustering.nearestPrototypeConfusion(embeddings,
      "embedding", "vec_id", "label").collect()
    val total = conf.map(_.getAs[Long]("n")).sum
    assert(total === embeddings.count(), "every vector lands in exactly one cell")
    val labels = embeddings.select("label").distinct().collect().map(_.getInt(0)).toSet
    conf.foreach { r =>
      assert(labels.contains(r.getAs[Int]("true_label")))
      assert(labels.contains(r.getAs[Int]("pred_label")))
    }
    // embeddings correlate with labels: prototype accuracy must clearly
    // beat the 1/|labels| chance floor (measured 0.374 vs 0.1 at sf0.001)
    val diag = conf.filter(r => r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    assert(diag.toDouble / total > 0.2, s"accuracy ${diag.toDouble / total}")
  }

  test("prototype assignment broadcasts — the corpus never shuffles vectors") {
    val plan = Clustering.nearestPrototypeConfusion(embeddings,
      "embedding", "vec_id", "label").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "prototype table must broadcast")
  }

  test("prototypeDrift: identical snapshots measure zero distance and cosine 1 per label") {
    import spark.implicits._
    val snap = Seq(
      (1L, 0, Seq(1.0, 2.0, 3.0)), (2L, 0, Seq(3.0, 2.0, 1.0)),
      (3L, 1, Seq(-1.0, 0.0, 4.0))).toDF("id", "label", "v")
    val rows = Clustering.prototypeDrift(snap, snap, "v", "label", dim = 3)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("l2_dist") == 0.0)
      assert(r.getAs[Double]("cos_sim") == 1.0)
      assert(r.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
    }
  }

  test("prototypeDrift: a planted per-label shift surfaces with the hand-computed distance") {
    import spark.implicits._
    val a = Seq(
      (1L, 0, Seq(1.0, 1.0)), (2L, 0, Seq(3.0, 3.0)),   // prototype (2, 2)
      (3L, 1, Seq(0.0, 0.0))).toDF("id", "label", "v")
    val b = Seq(
      (4L, 0, Seq(2.0, 2.0)),                            // same prototype (2, 2)
      (5L, 1, Seq(3.0, 4.0))).toDF("id", "label", "v")   // label 1 moved by (3, 4)
    val rows = Clustering.prototypeDrift(a, b, "v", "label", dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rows(0).getAs[Double]("l2_dist") == 0.0, "label 0 did not move")
    assert(rows(1).getAs[Double]("l2_dist") == 5.0, "3-4-5 triangle from the origin shift")
    assert(rows(0).getAs[Long]("n_a") == 2L && rows(0).getAs[Long]("n_b") == 1L)
  }

  test("prototypeDrift is invariant to input partitioning") {
    val a = embeddings.where(col("vec_id") % 2 === 0)
    val b = embeddings.where(col("vec_id") % 2 === 1)
    def run(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Clustering.prototypeDrift(x, y, "embedding", "label", dim = 64)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int]).toSeq
    assert(run(a, b) == run(a.repartition(13), b.repartition(7)))
  }
}
