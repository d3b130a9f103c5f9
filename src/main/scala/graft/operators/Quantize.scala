package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression — per-vector int8 scalar quantization, the
  * standard 4× shrink applied to an embedding corpus before ANN serving
  * (FAISS `SQ8`): each vector is affinely mapped from [min, max] onto
  * [-128, 127] with its own range, so storage drops from 4 bytes to 1 per
  * dimension while nearest-neighbour ordering degrades only marginally.
  *
  * Plan shape: pure per-row column arithmetic — no shuffle, no UDF. The
  * hot path is [[graft.functions.Int8Stats]], a single codegen'd Catalyst
  * expression that computes every statistic in one fused pass;
  * [[int8ProfileHof]] keeps the original higher-order-function formulation
  * (whose array lambdas Spark interprets per element) as the independent
  * cross-check — QuantizeSpec asserts the two are bitwise identical.
  *
  * Determinism: min/max/quantize/dequantize are IEEE-754 double ops on
  * exactly-widened floats, and the error sums accumulate in ARRAY order —
  * identical on any engine, no partition-order sensitivity.
  */
object Quantize {

  /** Quantized representation + fidelity report per vector:
    * (idCol, n_dims, q_min, q_max, q_sum, mse) where q_* are over the
    * int8 codes (q_sum is an exact integer checksum of the whole code
    * vector) and mse is the dequantization mean squared error rounded to
    * 8 decimals. A constant vector (max == min) maps to all-zero codes.
    * One codegen'd expression per row ([[graft.functions.Int8Stats]]).
    */
  def int8Profile(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    import graft.functions.Int8Stats.int8Stats
    df.select(col(idCol), int8Stats(col(vecCol)).as("__s"))
      .select(
        col(idCol),
        col("__s.n_dims").as("n_dims"),
        col("__s.q_min").as("q_min"),
        col("__s.q_max").as("q_max"),
        col("__s.q_sum").as("q_sum"),
        round(col("__s.mse"), 8).as("mse"))
  }

  /** The pre-[[graft.functions.Int8Stats]] higher-order-function
    * formulation — retained as the spec cross-check for the native
    * expression (and as the portable fallback for Spark forks without
    * extension expressions).
    */
  def int8ProfileHof(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), v.as("__v"))
      .withColumn("__mn", array_min(col("__v")))
      .withColumn("__mx", array_max(col("__v")))
      .withColumn("__q", quantCodes(col("__v"), col("__mn"), col("__mx")))
      .withColumn("__d", dequant(col("__q"), col("__mn"), col("__mx")))
      .select(
        col(idCol),
        size(col("__v")).cast("long").as("n_dims"),
        array_min(col("__q")).cast("long").as("q_min"),
        array_max(col("__q")).cast("long").as("q_max"),
        aggregate(col("__q"), lit(0L), (acc, q) => acc + q).as("q_sum"),
        round(
          aggregate(zip_with(col("__v"), col("__d"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, e) => acc + e) / size(col("__v")),
          8).as("mse"))
  }

  /** int8 codes: round((x - mn) / (mx - mn) * 255) - 128, all zero when
    * the vector is constant.
    */
  private def quantCodes(v: Column, mn: Column, mx: Column): Column =
    transform(v, x =>
      when(mx === mn, lit(0))
        .otherwise(round((x - mn) / (mx - mn) * 255, 0).cast("int") - 128))

  /** Dequantized doubles: mn + (q + 128) * (mx - mn) / 255. */
  private def dequant(q: Column, mn: Column, mx: Column): Column =
    transform(q, qi => mn + (qi + 128).cast("double") * (mx - mn) / 255)

  /** Per-DIMENSION calibration statistics over an embedding corpus:
    * (dim, n_vals, mean_val, min_val, max_val) for every coordinate — the
    * range scan behind per-channel (as opposed to [[int8Profile]]'s
    * per-vector) quantization, and the sanity profile that catches a dead
    * or exploding embedding dimension before it poisons ANN recall.
    *
    * Plan shape: one posexplode of the vector column into (dim, value)
    * pairs, then ONE dim-keyed aggregation — count/sum/min/max all combine
    * map-side, so the single shuffle carries `dims × partitions` partial
    * states, never the exploded stream. Nothing is corpus-cardinality but
    * the scan itself.
    *
    * Determinism: float→double widening is exact; the mean accumulates as
    * DECIMAL(28,9) so partition/summation order cannot perturb the last
    * bit (the q86 centroid rule). mean/min/max are presentation-rounded to
    * 6 decimals.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__dim", "__x")))
      .groupBy(col("__dim").cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n_vals"),
        round(sum(col("__x").cast("decimal(28,9)")).cast("double") / count(lit(1)), 6)
          .as("mean_val"),
        round(min(col("__x")), 6).as("min_val"),
        round(max(col("__x")), 6).as("max_val"))
}
