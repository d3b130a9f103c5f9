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

  test("calibration: hand-computed bins, Brier and log-loss on a tiny fixture") {
    import spark.implicits._
    // bins of width 0.1: 0.05→0, 0.15→1, 0.95→9, 1.0→9 (top bin absorbs)
    val d = Seq((0.05, 0.0), (0.15, 0.0), (0.95, 1.0), (1.0, 1.0)).toDF("s", "y")
    val rows = ClassifierEval.calibration(d, "s", "y", bins = 10)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 9L))
    val b9 = rows.find(_.getAs[Long]("bin") == 9L).get
    assert(b9.getAs[Long]("n") == 2L && b9.getAs[Long]("n_pos") == 2L)
    assert(b9.getAs[Double]("mean_score") === 0.975)
    assert(b9.getAs[Double]("pos_rate") === 1.0)
    // brier = (0.05² + 0.15² + 0.05² + 0²)/4 = 0.03/4 = 0.0075... exactly:
    // 0.0025 + 0.0225 + 0.0025 + 0 = 0.0275 / 4 = 0.006875
    assert(b9.getAs[Double]("brier") === 0.006875)
    // log_loss terms: -ln(1-0.05), -ln(1-0.15), -ln(0.95), -ln(1-1e-9 clamp)
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val terms = Seq(
      r9(-math.log(1.0 - 0.05)), r9(-math.log(1.0 - 0.15)),
      r9(-math.log(0.95)), r9(-math.log(math.min(1.0, 1.0 - 1e-9))))
    val expectLl = r9(terms.map(BigDecimal(_)).sum.toDouble / 4)
    assert(b9.getAs[Double]("log_loss") === expectLl)
    assert(b9.getAs[Long]("n_total") == 4L)
  }

  test("calibration: a perfectly calibrated score matches pos_rate to mean_score per bin") {
    import spark.implicits._
    // score s in {0.25, 0.75}; labels drawn deterministically to hit the
    // exact rate: of 100 rows at 0.25, exactly 25 positive, etc.
    val d = (0 until 200).map { i =>
      val s = if (i < 100) 0.25 else 0.75
      val y = if (i < 100) (if (i % 100 < 25) 1.0 else 0.0)
              else (if (i % 100 < 75) 1.0 else 0.0)
      (s, y)
    }.toDF("s", "y")
    val rows = ClassifierEval.calibration(d, "s", "y", bins = 4)
      .collect().sortBy(_.getAs[Long]("bin"))
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_score") === r.getAs[Double]("pos_rate"),
        s"calibrated fixture: bin ${r.getAs[Long]("bin")}")
    }
  }

  test("calibration: null scores and labels are excluded, not binned") {
    import spark.implicits._
    val d = Seq((Some(0.5), Some(1.0)), (None, Some(0.0)), (Some(0.5), None))
      .toDF("s", "y")
    val rows = ClassifierEval.calibration(d, "s", "y", bins = 10).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_total") == 1L)
  }

  test("calibration is invariant to input partitioning") {
    val df = spark.range(5000).select(
      (col("id") % 997).cast("double").divide(lit(1000.0)).as("score"),
      (col("id") % 3 === 0).cast("double").as("y"))
    def run(d: org.apache.spark.sql.DataFrame) =
      ClassifierEval.calibration(d, "score", "y").collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(run(df) == run(df.repartition(17)))
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

  test("the distinct-score bound is enforced loudly, not assumed") {
    val df = spark.range(0, 101).select(
      (col("id").cast("double") / 1000.0).as("score"),
      (col("id") % 2).cast("double").as("y"))
    // 101 distinct scores against a bound of 100 → fail BEFORE the window
    val e = intercept[IllegalArgumentException] {
      ClassifierEval.binaryMetrics(df, "score", "y", maxDistinctScores = 100L)
    }
    assert(e.getMessage.contains("distinct scores exceed"))
    // exactly at the bound passes
    val ok = ClassifierEval.binaryMetrics(df, "score", "y", maxDistinctScores = 101L)
    assert(ok.count() === 1L)
  }
}
