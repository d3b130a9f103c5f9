package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality reconnaissance pass a warehouse
  * load runs before trusting a new feed (the engine's counterpart of the
  * reference DAG's row-count/null-ratio logging, generalized to any
  * table). One output row per profiled column:
  * (column, n_rows, n_null, n_distinct, min_value, max_value).
  *
  * Plan shape: ONE aggregation node computes every measure for every
  * column in a single scan (no per-column scan loop), then a `stack`
  * projection melts the 1×(4·cols) row to long format — the melt happens
  * on ONE row, so it costs nothing at any scale. min/max are computed on
  * the column's own type and cast to string afterwards, preserving
  * numeric/date ordering while keeping the output schema uniform.
  *
  * `exact = true` uses count(DISTINCT col) — Spark plans multiple distinct
  * aggregates via Expand (rows × profiled columns before partial
  * aggregation), which is the right trade for a verification profile. At
  * 100 TB, profile with `exact = false`: approx_count_distinct (HLL) keeps
  * the single-scan shape with no Expand blowup and a documented ~2% error.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // Internal measure names are POSITIONAL (__nn_0, __nd_0, ...), never
    // derived from the profiled column name, and the melt below is pure
    // Column DSL — a column named `a.b`, `it's`, or `x` + backtick can
    // neither break nor inject into any generated SQL. The profiled name
    // only ever appears as a string LITERAL in the output.
    // backtick-quote (doubling embedded backticks) so a name containing a
    // dot resolves as the top-level column, not a nested-field path
    val inputs = cols.map(c => df.col("`" + c.replace("`", "``") + "`"))
    val measures = inputs.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(c).as(s"__nn_$i"),
        (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"__nd_$i"),
        min(c).cast("string").as(s"__min_$i"),
        max(c).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), measures: _*)
    val melted = cols.indices.map { i =>
      struct(
        lit(cols(i)).as("column"),
        col(s"__nn_$i").as("__nn"),
        col(s"__nd_$i").cast("long").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    one.select(col("__n_rows"), explode(array(melted: _*)).as("__m"))
      .select(
        col("__m.column").as("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("__m.__nn")).as("n_null"),
        col("__m.n_distinct").as("n_distinct"),
        col("__m.min_value").as("min_value"),
        col("__m.max_value").as("max_value"))
  }

  /** Equal-width histogram of a numeric column: (bucket, lo_edge, hi_edge,
    * n_rows) for the non-empty buckets among `n` equal divisions of the
    * observed [min, max]. Bounds stay IN-PLAN (one map-side-combinable
    * min/max pass broadcast back as a 1-row cross join — never a driver
    * collect), then bucketing is a pure per-row projection: two corpus
    * scans total, shuffle volume = |non-empty buckets|. The max value
    * lands in the last bucket; nulls are excluded. Degenerate case
    * (min == max): every row in bucket 0.
    *
    * Edge arithmetic is the same double expression on any engine
    * (`floor((x - mn) * n / (mx - mn))`), so the DuckDB oracle replays it
    * exactly — edges are presentation-rounded to 4 decimals.
    */
  def histogram(df: DataFrame, colName: String, n: Int): DataFrame = {
    require(n >= 1, s"need at least 1 bucket, got $n")
    val x = df.col("`" + colName.replace("`", "``") + "`").cast("double")
    val vals = df.where(x.isNotNull).select(x.as("__x"))
    val bounds = vals.agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
    vals.join(broadcast(bounds))
      .withColumn("bucket",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col("__x") - col("__mn")) * n / (col("__mx") - col("__mn"))).cast("long"),
            lit(n - 1L))))
      .groupBy(col("bucket"))
      .agg(
        round(first(col("__mn")) + col("bucket") * ((first(col("__mx")) - first(col("__mn"))) / n), 4).as("lo_edge"),
        round(first(col("__mn")) + (col("bucket") + 1) * ((first(col("__mx")) - first(col("__mn"))) / n), 4).as("hi_edge"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-group Tukey-fence outlier screening of a numeric column: for each
    * group, the exact p25/p75 (linear interpolation — DuckDB's
    * quantile_cont semantics), the [p25 − k·IQR, p75 + k·IQR] fences, and
    * how many rows fall outside them. The robust-statistics filter a
    * curation pipeline runs on document length / score distributions
    * before trusting thresholds tuned on the mean.
    *
    * Plan shape: the fences come from one group-keyed percentile
    * aggregation over (group, value) — a |groups|-row table that
    * broadcast-joins back onto the scan, so classifying is a pure
    * projection and the only corpus-sized shuffle is the final group
    * count's map-side-combined partials. Exact percentiles hold sorted
    * per-group state on the agg side; at 100 TB swap in
    * percentile_approx (same plan, bounded sketch state) — the fences
    * are heuristic cutoffs, not query answers.
    */
  def iqrOutlierStats(df: DataFrame, groupCol: String, valueCol: String,
                      k: Double = 1.5): DataFrame = {
    require(k >= 0, s"fence multiplier must be >= 0, got $k")
    val v = col(valueCol).cast("double")
    val fences = df.where(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        expr(s"percentile(CAST(`${valueCol.replace("`", "``")}` AS DOUBLE), 0.25)").as("__p25"),
        expr(s"percentile(CAST(`${valueCol.replace("`", "``")}` AS DOUBLE), 0.75)").as("__p75"))
      .select(col(groupCol),
        (col("__p25") - lit(k) * (col("__p75") - col("__p25"))).as("__lo"),
        (col("__p75") + lit(k) * (col("__p75") - col("__p25"))).as("__hi"))
    df.where(v.isNotNull)
      .join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum((v < col("__lo") || v > col("__hi")).cast("long")).as("n_outliers"),
        round(first(col("__lo")), 4).as("lo_fence"),
        round(first(col("__hi")), 4).as("hi_fence"))
  }

  /** Robust scaling — median/MAD standardization, the outlier-immune
    * sibling of z-scoring (mean/stddev move arbitrarily far under a
    * single corrupted value; median and MAD have breakdown point 0.5):
    *
    *   z = (x − median(x)) / MAD,  MAD = median(|x − median(x)|)
    *
    * the feature-normalization gate of a curation pipeline (quality
    * scores, lengths, perplexities all have heavy tails where plain
    * z-scores saturate). Raw MAD scaling — consumers multiplying by
    * 1.4826 for normal-consistency do so downstream; the operator does
    * not bake a distributional assumption in.
    *
    * Rows with |z| > `fence` flag as outliers. A zero MAD (over half
    * the values identical) yields null z and outlier = 0 — a degenerate
    * column fails visibly rather than dividing by zero.
    *
    * Determinism: both medians are Spark's exact interpolated
    * `percentile` == DuckDB `quantile_cont` (the q19/q92 identity); z
    * rounds to 9 (interpolated medians are not grid-aligned — no tie
    * class exists). Plan shape: two percentile aggregations (the second
    * over |x − med| needs the first's 1-row result — an inherent
    * two-pass dependency), each a 1-row broadcast back onto the scan;
    * classification is a pure projection. At 100 TB swap
    * percentile_approx into both passes (same plan, bounded state).
    */
  def robustScale(df: DataFrame, idCol: String, valueCol: String,
                  fence: Double = 3.5): DataFrame = {
    require(fence > 0, s"fence must be > 0, got $fence")
    val v = col(valueCol).cast("double")
    val quoted = valueCol.replace("`", "``")
    val base = df.where(v.isNotNull)
    val med = base.agg(
      expr(s"percentile(CAST(`$quoted` AS DOUBLE), 0.5)").as("__med"))
    val withMed = base.crossJoin(broadcast(med))
    val mad = withMed.agg(
      expr("percentile(abs(CAST(`" + quoted + "` AS DOUBLE) - __med), 0.5)").as("__mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col(idCol), v.as("value"),
        when(col("__mad") =!= 0.0,
          round((v - col("__med")) / col("__mad"), 9)).as("z"),
        when(col("__mad") =!= 0.0 &&
            abs((v - col("__med")) / col("__mad")) > fence, 1L)
          .otherwise(0L).as("outlier"))
  }
}
