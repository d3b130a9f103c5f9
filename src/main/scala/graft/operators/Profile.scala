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
    val measures = col("__n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), measures.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __nn_$c, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.selectExpr(
        "__n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column, __nn, n_distinct, min_value, max_value)")
      .select(
        col("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("__nn")).as("n_null"),
        col("n_distinct"),
        col("min_value"),
        col("max_value"))
  }
}
