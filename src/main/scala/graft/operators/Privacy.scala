package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit + suppression — the structured-data privacy gate
  * beside the text-side PII redaction (q48): a release is k-anonymous
  * when every combination of quasi-identifier values is shared by at
  * least k rows, so no combination singles out fewer than k people.
  * Groups below k must be suppressed (or generalized) before export —
  * the standard pre-release check on training-data metadata tables
  * (Sweeney, IJUFKS 2002; the reference has no privacy surface at all).
  *
  * Scale shape: ONE map-side-combinable aggregation over the
  * quasi-identifier key (shuffle bounded by distinct combinations, not
  * rows); the row-level verdict joins the group table back — at scale
  * the group table is usually broadcastable (distinct quasi combos ≪
  * rows), and Catalyst picks that on its own under AQE; nothing here is
  * row-pairwise.
  */
object Privacy {

  /** Per-equivalence-class audit: one row per distinct quasi-identifier
    * combination with its size and verdict (`anonymous` = 1 iff size ≥ k).
    * Null quasi values form their own class (a null combo is as
    * identifying as any other).
    */
  def kAnonymityClasses(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", when(col("n") >= k, 1L).otherwise(0L))
  }

  /** Row-level suppression verdicts: the input with `__keep` = 1 iff the
    * row's equivalence class reaches k. Publishing `where(__keep = 1)`
    * yields the largest k-anonymous subset obtainable by row suppression
    * alone (every surviving class still has its full ≥ k members, so no
    * class shrinks below k by the filter itself).
    */
  /** Distinct l-diversity audit — k-anonymity's necessary complement: a
    * class can hold k rows yet leak the sensitive attribute completely
    * if all k share one value (the homogeneity attack). One row per
    * quasi combination: class size, distinct sensitive values, and the
    * verdict at `l`. Same single-aggregation scale shape as
    * [[kAnonymityClasses]]; the distinct count plans as Catalyst's
    * two-phase partial-distinct Expand.
    */
  def lDiversityClasses(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", when(col("n_sensitive") >= l, 1L).otherwise(0L))
  }

  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val classes = kAnonymityClasses(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("anonymous").as("__keep"): _*)
    // null-safe equality: a null quasi combo is its own class and must
    // match itself (a plain equi-join would leave those rows unjudged)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(classes, cond, "left").drop(quasiCols.map(c => s"__q_$c"): _*)
  }
}
