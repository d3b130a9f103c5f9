package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkTestBase {
  import spark.implicits._

  test("elementwise mean across groups with partial aggregation") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 6.0f)),
      (2L, Seq(10.0f, 0.0f))
    ).toDF("g", "v").repartition(4) // force multi-partition merge path
    val vm = udaf(VectorMean)
    val out = df.groupBy("g").agg(vm(col("v")).as("mean"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) === Seq(2.0, 4.0))
    assert(out(2L) === Seq(10.0, 0.0))
  }

  test("centroid refinement: one k-means step moves centroids to list means") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val vm = udaf(VectorMean)
    import graft.functions.CosineSimilarity.cosineSim
    import org.apache.spark.sql.expressions.Window
    val cents = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("s").desc, col("cid"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("s", cosineSim(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    val refined = assigned.groupBy("cid").agg(vm(col("embedding")).as("centroid"))
    val rows = refined.collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getSeq[Double](1).length === 64))
  }
}
