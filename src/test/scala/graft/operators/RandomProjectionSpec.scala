package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("component matches an independent MessageDigest computation") {
    for (o <- 1 to 4; i <- 1 to 8) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp_${o}_$i".getBytes("UTF-8"))
      val expect = if (((d(0) >> 4) & 1) == 1) 1.0 else -1.0
      assert(RandomProjection.component(o, i) == expect)
    }
    // the matrix is not degenerate: both signs occur
    val signs = (for (o <- 1 to 16; i <- 1 to 64) yield RandomProjection.component(o, i)).toSet
    assert(signs == Set(1.0, -1.0))
  }

  test("projection preserves squared norms in expectation (JL guarantee)") {
    val rows = RandomProjection.project(emb, "embedding", "vec_id", 64, 16)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
      .select(
        aggregate(col("proj"), lit(0.0), (a, x) => a + x * x).as("np"),
        aggregate(col("v"), lit(0.0), (a, x) => a + x * x).as("nx"))
      .collect()
    val ratios = rows.map(r => r.getDouble(0) / r.getDouble(1))
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15,
      s"mean norm ratio must be ~1 over ${ratios.length} vectors, got $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"individual ratios stay in the JL tail bound, worst ${ratios.min}/${ratios.max}")
  }

  test("pairwise distances are preserved within JL distortion on a sample") {
    val joined = RandomProjection.project(emb, "embedding", "vec_id", 64, 16)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
      .where(col("vec_id") < 30)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Double](r.fieldIndex("proj")).toArray,
        r.getSeq[Double](r.fieldIndex("v")).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (ia, pa, va) <- joined; (ib, pb, vb) <- joined if ia < ib
    } yield d2(pa, pb) / d2(va, vb)
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, s"mean distance ratio ~1, got $mean")
    assert(ratios.count(r => r > 0.4 && r < 2.2).toDouble / ratios.length > 0.95,
      "95% of pair distances inside the k=16 distortion band")
  }

  test("the plan is a pure projection: no exchange, no join, no generator") {
    val plan = RandomProjection.project(emb, "embedding", "vec_id", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"projection must not explode:\n$plan")
  }

  test("deterministic and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      RandomProjection.project(df, "embedding", "vec_id", 64, 16)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(run(emb) == run(emb.repartition(13, col("vec_id"))))
  }

  test("wrong-width rows are excluded") {
    val d = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    assert(RandomProjection.project(d, "v", "id", 2, 2).count() == 1L)
  }
}
