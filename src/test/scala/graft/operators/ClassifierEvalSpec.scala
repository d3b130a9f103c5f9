package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def metrics(rows: Seq[(Double, Double)], threshold: Double = 0.5) =
    ClassifierEval.binaryMetrics(rows.toDF("score", "y"), "score", "y", threshold)
      .collect().head

  test("AUC matches the hand-computed rank-sum on a tie-free fixture") {
    // ascending ranks: 0.3→1, 0.7→2, 0.8→3, 0.9→4; positive ranks 2+4=6
    // AUC = (6 − 2·3/2) / (2·2) = 0.75
    val m = metrics(Seq((0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.3, 0.0)))
    assert(m.getAs[Double]("auc") === 0.75)
    assert(m.getAs[Long]("n_pos") === 2L && m.getAs[Long]("n_neg") === 2L)
  }

  test("ties take the mid-rank: one positive and one negative at the same score give AUC 0.5") {
    val m = metrics(Seq((0.5, 1.0), (0.5, 0.0)))
    assert(m.getAs[Double]("auc") === 0.5)
  }

  test("perfect and inverted rankings hit 1.0 and 0.0") {
    assert(metrics(Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0))).getAs[Double]("auc") === 1.0)
    assert(metrics(Seq((0.9, 0.0), (0.1, 1.0))).getAs[Double]("auc") === 0.0)
  }

  test("mixed-tie fixture: hand-computed mid-ranks") {
    // scores asc: 0.2(n,1 row, rank 1), 0.6(3 rows: p,p,n — mid-rank 3),
    // 0.9(p, rank 5). R+ = 3 + 3 + 5 = 11; P=3, N=2
    // AUC = (11 − 3·4/2) / (3·2) = 5/6 = 0.833333333…
    val m = metrics(Seq((0.2, 0.0), (0.6, 1.0), (0.6, 1.0), (0.6, 0.0), (0.9, 1.0)))
    assert(m.getAs[Double]("auc") === 0.833333333)
  }

  test("confusion matrix at the threshold and the degenerate single-class guard") {
    val m = metrics(Seq((0.9, 1.0), (0.6, 0.0), (0.4, 1.0), (0.1, 0.0)), threshold = 0.5)
    assert(m.getAs[Long]("tp") === 1L && m.getAs[Long]("fp") === 1L)
    assert(m.getAs[Long]("fn") === 1L && m.getAs[Long]("tn") === 1L)
    assert(m.getAs[Double]("precision") === 0.5 && m.getAs[Double]("recall") === 0.5)
    // all-positive input: AUC undefined → null, not NaN; only the
    // above-threshold positive counts as recalled
    val solo = metrics(Seq((0.9, 1.0), (0.3, 1.0)))
    assert(solo.isNullAt(solo.fieldIndex("auc")))
    assert(solo.getAs[Double]("recall") === 0.5)
    assert(solo.getAs[Double]("precision") === 1.0)
  }

  test("the AUC plan has no pair join: one shuffle over the corpus, windows over distinct scores only") {
    val df = spark.range(1000).select(
      (col("id") % 97).cast("double").divide(lit(100.0)).as("score"),
      (col("id") % 2).cast("double").as("y"))
    val plan = ClassifierEval.binaryMetrics(df, "score", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair scan leaked into the AUC plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join of any kind belongs in the rank-sum plan:\n$plan")
  }
}
