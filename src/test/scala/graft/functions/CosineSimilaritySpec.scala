package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity.cosineSim

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("native expression is bitwise-identical to the HOF formulation on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).where(col("ida") < col("idb")).limit(2000)
    val both = pairs.select(
      cosineSim(col("va"), col("vb")).as("native"),
      VectorFunctions.cosine(col("va"), col("vb")).as("hof"))
    val mismatches = both.where(col("native") =!= col("hof") ||
      (col("native").isNull !== col("hof").isNull)).count()
    assert(mismatches === 0L)
  }

  test("null / length-mismatch / zero-norm semantics") {
    val d = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))),      // length mismatch
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 2.0f))), // zero norm
      (None, Some(Seq(1.0f, 2.0f)))                   // null input
    ).toDF("a", "b")
    val out = d.select(cosineSim(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
  }

  test("double arrays also accepted") {
    val d = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
    val c = d.select(cosineSim(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(c - 24.0 / 25.0) < 1e-12)
  }

  test("SQL registration via GraftExtensions") {
    // the shared test session lacks the extension; register directly
    new graft.GraftExtensions() // ensure class loads
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)),
      "built-in")
    val out = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0)
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
  }
}
