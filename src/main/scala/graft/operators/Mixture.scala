package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixture weighting — the α-sampling allocation step of a
  * multilingual / multi-domain training pipeline (the exponent-smoothed
  * sampling of mBERT/XLM-R and the budget split a dataset card publishes):
  * group the corpus by a stratum column (language, source domain), raise
  * each stratum's token mass to `alpha` < 1 to up-weight the long tail,
  * normalize into sampling weights, and allocate a global token budget.
  *
  * Scale shape: ONE map-side-combinable aggregation over the corpus
  * (token counting fused into the same scan), then arithmetic on the
  * tiny per-stratum table; the normalizing total is an unpartitioned
  * window sum over THAT table — a single-partition window bounded by the
  * stratum cardinality (languages/domains: at most thousands), never by
  * the corpus, so the corpus is scanned exactly once and no cross join
  * appears in the plan.
  *
  * Determinism: per-stratum token sums are exact longs; the smoothed
  * masses are quantized to DECIMAL(38,9) before the normalizing sum, so
  * the total is exact decimal arithmetic — partition order cannot perturb
  * the weights (same device as the LM scores' decimal mean). With
  * `alpha = 0.5` the smoothing is `sqrt`, correctly rounded by IEEE-754 on
  * every engine, making the whole output bit-replayable; other exponents
  * go through `pow`, whose last ulp is libm-dependent.
  */
object Mixture {

  /** Per-stratum sampling weights and token allocation. Returns
    * (groupCol, n_docs, n_tokens, weight, budget_tokens) where weight is
    * the normalized α-smoothed token share rounded to 6 decimals and
    * budget_tokens = round(budgetTokens · share).
    */
  def alphaWeights(df: DataFrame, groupCol: String, textCol: String,
                   alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val perGroup = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(textCol).isNotNull,
          size(split(trim(col(textCol)), "\\s+")).cast("long")).otherwise(0L))
          .as("n_tokens"))
    val smoothed =
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), lit(alpha))
    val massed = perGroup.withColumn("__mass", smoothed.cast("decimal(38,9)"))
    massed
      .withColumn("__total",
        sum(col("__mass")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__share",
        col("__mass").cast("double") / col("__total").cast("double"))
      .select(
        col(groupCol),
        col("n_docs"),
        col("n_tokens"),
        round(col("__share"), 6).as("weight"),
        round(col("__share") * budgetTokens, 0).cast("long").as("budget_tokens"))
  }
}
