package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  test("one GD step from zero weights matches the hand-computed gradient") {
    // w = 0 makes the sigmoid exactly 0.5 per row, so the first gradient
    // is sum((0.5 - y) * x): g_bias = 0, g_x = 1.0 on this fixture, and
    // with lr = 0.5, n = 4: w_x = -0.5 * (1.0 / 4) = -0.125
    val d = Seq((1.0, 1.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0)).toDF("x", "y")
    val w = LogReg.fit(d, Seq("x" -> col("x")), col("y"), iters = 1, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("bias") === 0.0)
    assert(w("x") === -0.125)
  }

  test("a separable fixture learns the right sign and ranks scores accordingly") {
    val d = Seq(-3.0, -2.0, -1.0, 1.0, 2.0, 3.0).zipWithIndex
      .map { case (x, i) => (i.toLong, x, if (x > 0) 1.0 else 0.0) }
      .toDF("id", "x", "y")
    val w = LogReg.fit(d, Seq("x" -> col("x")), col("y"), iters = 3, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("x") > 0, s"positive-x class must earn a positive weight, got ${w("x")}")
    val scores = LogReg.scoreAll(d, "id", Seq("x" -> col("x")), col("y"), iters = 3, lr = 0.5)
      .collect().map(r => r.getAs[Double]("x") -> r.getAs[Double]("score")).toMap
    assert(scores(3.0) > scores(-3.0),
      s"separable classes must rank: ${scores(3.0)} vs ${scores(-3.0)}")
  }

  test("fitted weights are invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
    val feats = Seq(
      "x_chars" -> (col("n_chars").cast("double") / lit(1000.0)),
      "x_tokens" -> (size(split(trim(lower(col("text"))), "\\s+")).cast("double") / lit(100.0)))
    val label = when(col("lang") === "en", 1.0).otherwise(0.0)
    def weights(df: org.apache.spark.sql.DataFrame) =
      LogReg.fit(df, feats, label).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = weights(docs)
    val b = weights(docs.repartition(13, col("doc_id")))
    assert(a === b, "decimal-quantized gradients must not see partitioning")
  }

  test("mini-batch fit converges on the separable fixture and stays deterministic") {
    // ids spread across both md5 buckets; 4 epochs × 2 batches = 8 steps
    val d = (0L to 19L).map { i =>
      val x = if (i % 2 == 0) -(1.0 + i / 2.0) else 1.0 + i / 2.0
      (i, x, if (x > 0) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    def wOf(df: org.apache.spark.sql.DataFrame) =
      LogReg.fitMiniBatch(df, "id", Seq("x" -> col("x")), col("y"),
          epochs = 4, batches = 2)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w = wOf(d)
    assert(w("x") > 0, s"positive-x class must earn a positive weight, got ${w("x")}")
    // determinism: batch assignment is a pure row function, so weights
    // must survive an adversarial repartition byte-for-byte
    assert(wOf(d.repartition(7, col("y"))) === w)
  }

  test("mini-batch with one batch and one epoch equals a full-batch GD step") {
    val d = Seq((1L, 1.0, 1.0), (2L, 2.0, 0.0), (3L, 3.0, 1.0), (4L, 4.0, 0.0))
      .toDF("id", "x", "y")
    val full = LogReg.fit(d, Seq("x" -> col("x")), col("y"), iters = 2, lr = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val mini = LogReg.fitMiniBatch(d, "id", Seq("x" -> col("x")), col("y"),
        epochs = 2, batches = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mini === full, "batches=1 must degenerate to exactly full-batch GD")
  }

  test("scoring is a pure projection: no join, no exchange after the fit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
    val plan = LogReg.scoreAll(docs, "doc_id",
        Seq("x_chars" -> (col("n_chars").cast("double") / lit(1000.0))),
        when(col("lang") === "en", 1.0).otherwise(0.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"weights must ride as literals, not a join:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
