package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation — the measurement pass a quality-filter
  * rollout runs after [[LogReg]] fits and scores (does the fitted gate
  * actually rank good documents above bad ones, and what does the chosen
  * threshold cost in precision/recall?).
  *
  * AUC comes from the rank-sum (Mann–Whitney) identity, NOT a pair join:
  * AUC = (R⁺ − P(P+1)/2) / (P·N) where R⁺ is the sum of positive ranks
  * under ascending score with mid-rank tie handling. One corpus-wide
  * aggregation groups rows by score; every rank quantity after that lives
  * on the DISTINCT-SCORE table, so the O(P·N) pair semantics costs one
  * shuffle ∝ corpus plus window/agg work ∝ distinct scores.
  *
  * Determinism (the LogReg doctrine): ranks are computed as INTEGERS —
  * `rank2 = 2·(rows strictly below) + n + 1` is twice the mid-rank, so
  * the rank-sum accumulates exactly in LONG arithmetic with no float
  * order sensitivity, and the single final division is one IEEE op both
  * engines round identically (then round(…, 9) for belt and braces).
  *
  * Scale: the one partition-less window runs over DISTINCT score values —
  * for a 6-decimal-quantized probability that is ≤ 1,000,001 rows no
  * matter the corpus size, a bounded single-partition sort by
  * construction. The bound is ENFORCED, not assumed: the distinct-score
  * table is counted before the window runs and the call fails loudly if
  * it exceeds `maxDistinctScores` (default 1e6+1) — a caller feeding
  * unquantized scores cannot silently single-partition a corpus
  * ([[LogReg.scoreAll]]'s 6-decimal contract satisfies the bound).
  */
object ClassifierEval {

  /** One-row metrics frame over (`scoreCol`, `labelCol`):
    * (auc, n_pos, n_neg, tp, fp, fn, tn, precision, recall) with the
    * confusion matrix taken at `score >= threshold` and label positivity
    * at `label > 0.5`. Ratio columns are null when undefined (no
    * positives / no negatives / no predicted positives) rather than NaN —
    * a missing measurement, not a zero one.
    */
  def binaryMetrics(df: DataFrame, scoreCol: String, labelCol: String,
                    threshold: Double = 0.5,
                    maxDistinctScores: Long = 1000001L): DataFrame = {
    require(maxDistinctScores >= 1, s"maxDistinctScores must be >= 1, got $maxDistinctScores")
    val byScore = df
      .select(col(scoreCol).cast("double").as("__score"),
        when(col(labelCol).cast("double") > 0.5, 1L).otherwise(0L).as("__pos"))
      .groupBy("__score")
      .agg(count(lit(1)).as("__n"), sum(col("__pos")).as("__np"))
      // eagerly materialized so the bound check below fails BEFORE the
      // single-partition rank window ever runs (and the corpus-wide
      // shuffle that builds the distinct-score table runs exactly once)
      .localCheckpoint(true)
    // LOUD guard on the quantization contract: the rank window is a
    // single-partition sort, safe only because a 6-decimal-quantized
    // probability has ≤ 1e6+1 distinct values. A caller feeding
    // unquantized scores gets this error, not a silently
    // single-partitioned corpus — round(score, 6) first, or raise the
    // bound deliberately if the sort really is intended.
    val mDistinct = byScore.count()
    require(mDistinct <= maxDistinctScores,
      s"binaryMetrics: $mDistinct distinct scores exceed the $maxDistinctScores bound " +
        "the single-partition rank window relies on — quantize scores first " +
        "(LogReg.scoreAll's 6-decimal contract), or pass a higher maxDistinctScores knowingly")
    // rows strictly below this score; twice-mid-rank stays integral
    val w = Window.orderBy("__score").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore.withColumn("__rank2",
      lit(2L) * coalesce(sum(col("__n")).over(w), lit(0L)) + col("__n") + lit(1L))
    val totals = ranked.agg(
      sum(col("__np")).as("p"),
      sum(col("__n") - col("__np")).as("n"),
      sum(col("__np") * col("__rank2")).as("rs2"),
      sum(when(col("__score") >= threshold, col("__np")).otherwise(0L)).as("tp"),
      sum(when(col("__score") >= threshold, col("__n") - col("__np")).otherwise(0L)).as("fp"))
    totals.select(
      round(when(col("p") > 0 && col("n") > 0,
        (col("rs2") - col("p") * (col("p") + 1)).cast("double") /
          (lit(2.0) * (col("p") * col("n")).cast("double"))), 9).as("auc"),
      col("p").as("n_pos"),
      col("n").as("n_neg"),
      col("tp"),
      col("fp"),
      (col("p") - col("tp")).as("fn"),
      (col("n") - col("fp")).as("tn"),
      round(when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double")), 9).as("precision"),
      round(when(col("p") > 0,
        col("tp").cast("double") / col("p").cast("double")), 9).as("recall"))
  }

  /** Calibration / reliability report: is a score of 0.8 actually right
    * 80% of the time? `bins` equal-width score bins over [0, 1] (the
    * probability contract of [[LogReg.scoreAll]]; the top bin absorbs
    * score = 1.0), one row per NON-EMPTY bin:
    * `(bin, n, n_pos, mean_score, pos_rate)` — a well-calibrated model
    * has mean_score ≈ pos_rate per bin — plus the corpus-constant proper
    * scoring rules `brier` (mean squared error of the probability) and
    * `log_loss` (cross-entropy, scores clamped to [ε, 1−ε] against
    * ln(0)), and `n_total`, carried on every row as the in-plan 1-row
    * broadcast (the q43 shape; never a driver collect).
    *
    * Scale/determinism: two aggregations over one narrow projection —
    * the per-bin one shuffles ≤ `bins` groups, the scalar one is a 1-row
    * reduce; means/Brier accumulate as DECIMAL(28,12); the log-loss term
    * rounds to 9 decimals PER ROW before summing (ln is the
    * transcendental libm may skew by an ulp — the sigmoid9 doctrine).
    * Null scores/labels are excluded (a missing measurement, not a 0).
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val base = df
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("double").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val binned = base
      .groupBy(least(floor(col("__s") * bins), lit(bins - 1)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__y") > 0.5, 1L).otherwise(0L)).as("n_pos"),
        round(sum(col("__s").cast("decimal(28,12)")).cast("double") / count(lit(1)), 9)
          .as("mean_score"))
    val pc = greatest(least(col("__s"), lit(1.0) - lit(1e-9)), lit(1e-9))
    val ll = round(-(col("__y") * log(pc) + (lit(1.0) - col("__y")) * log(lit(1.0) - pc)), 9)
    val scalars = base.agg(
      round(sum(((col("__s") - col("__y")) * (col("__s") - col("__y")))
        .cast("decimal(28,12)")).cast("double") / count(lit(1)), 9).as("brier"),
      round(sum(ll.cast("decimal(28,12)")).cast("double") / count(lit(1)), 9).as("log_loss"),
      count(lit(1)).as("n_total"))
    binned
      .select(col("bin"), col("n"), col("n_pos"), col("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 9).as("pos_rate"))
      .crossJoin(broadcast(scalars))
  }
}
