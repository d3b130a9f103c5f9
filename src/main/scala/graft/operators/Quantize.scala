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

  // ---------------------------------------------------------------------
  // Product quantization (the IVF-PQ compression path): split each vector
  // into `m` contiguous subvectors, k-means each subspace independently,
  // and store per vector only the m nearest-centroid ids — 64 float dims
  // become 4 bytes. Composes the engine's existing pieces: deterministic
  // lowest-id seeds (Similarity.seedCentroids), one decimal-exact Lloyd
  // step per subspace (the q86 Clustering.lloydStep rule), broadcast-
  // argmin assignment (the q76 shape), and ADC scoring in
  // Similarity.pqTopK.
  // ---------------------------------------------------------------------

  /** Unrolled squared-L2 distance between two array<double> columns of
    * STATIC width `dim`: a left-associated sum of (a_i − b_i)² terms —
    * plain codegen'd arithmetic with a fixed association order (the
    * signPlaneBucket unroll precedent), so any engine replays it bit for
    * bit; an interpreted higher-order `aggregate` fold would be slower AND
    * harder to replay.
    */
  def l2Sq(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { j =>
      val d = element_at(a, j + 1) - element_at(b, j + 1)
      d * d
    }.reduce(_ + _)

  /** (__vid, __ss, __sv): every input vector split into `m` subvectors of
    * `subDim` contiguous dimensions — subspace `s` covers dims
    * [s·subDim, (s+1)·subDim). One projection, no shuffle.
    */
  private[operators] def sliced(df: DataFrame, vecCol: String, idCol: String,
                                m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("__vid"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("__vid"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("__v"), s * subDim + 1, lit(subDim)))).as(Seq("__ss", "__sv")))

  /** PQ codebook training: per subspace, `k` centroids seeded from the
    * `k` lowest-id vectors' subvectors (dense ids 0..k−1 in vector-id
    * order — deterministic on any engine) and refined by ONE decimal-exact
    * Lloyd step (the q86 policy: iterate further as needed; a cluster that
    * attracts no members emits no rows and the caller carries the seed
    * forward). Output: (subspace, centroid_id, dim, n_members, value)
    * with `dim` 0-based within the subspace and `value` the member mean
    * rounded to `roundTo` decimals.
    *
    * Plan shape: the k·m seed table BROADCASTS; assignment is a broadcast
    * join + min(struct(dist, cid, sv)) aggregation — argmin as a map-side-
    * combinable struct-min, so the (vid, subspace)-keyed shuffle carries
    * one candidate per group per map task, never the k-way fan-out. The
    * update explodes members to (subspace, cid, dim, value) and runs ONE
    * aggregation whose state is bounded by m · k · subDim · partitions,
    * independent of corpus size.
    */
  def pqCodebooks(df: DataFrame, vecCol: String, idCol: String,
                  m: Int, subDim: Int, k: Int, roundTo: Int = 6): DataFrame = {
    require(m >= 1 && subDim >= 1 && k >= 1, s"need m, subDim, k >= 1")
    import org.apache.spark.sql.expressions.Window
    val seeds = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("__sid"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__cid",
        row_number().over(Window.orderBy(col("__sid"))).cast("long") - 1)
      .select(col("__cid"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("__v"), s * subDim + 1, lit(subDim)))).as(Seq("__ss", "__cv")))
    sliced(df, vecCol, idCol, m, subDim)
      .join(broadcast(seeds), Seq("__ss"))
      .withColumn("__d", l2Sq(col("__sv"), col("__cv"), subDim))
      .groupBy(col("__vid"), col("__ss"))
      .agg(min(struct(col("__d"), col("__cid"), col("__sv"))).as("__m"))
      .select(col("__ss"), col("__m.__cid").as("__cid"),
        posexplode(col("__m.__sv")).as(Seq("dim", "__val")))
      .groupBy(col("__ss"), col("__cid"), col("dim"))
      .agg(
        count(lit(1)).as("n_members"),
        round(sum(col("__val").cast("decimal(28,9)")).cast("double") / count(lit(1)),
          roundTo).as("value"))
      .select(col("__ss").cast("long").as("subspace"), col("__cid").as("centroid_id"),
        col("dim").cast("long").as("dim"), col("n_members"), col("value"))
  }

  /** Reassemble [[pqCodebooks]]'s flat (subspace, centroid_id, dim, value)
    * rows into (__ss, __cid, __cv: array<double>) — the broadcastable form
    * assignment and ADC scoring consume. Tiny table (m · k rows);
    * array_sort on the carried dim neutralizes collect_list order.
    */
  def pqCodebookArrays(codebooks: DataFrame): DataFrame =
    codebooks.groupBy(col("subspace"), col("centroid_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("value")))).as("__ps"))
      .select(col("subspace").as("__ss"), col("centroid_id").as("__cid"),
        transform(col("__ps"), _.getField("value")).as("__cv"))

  /** PQ code assignment: each vector's m subvectors mapped to their
    * nearest codebook centroid (squared L2, ties to the lower centroid
    * id). Output: (idCol, subspace, code) — the m-byte compressed
    * representation, one row per (vector, subspace).
    *
    * Plan shape: codebook broadcasts (m·k rows); argmin is the same
    * map-side-combinable min(struct) as training — the only shuffle is
    * (vid, subspace)-keyed partial-argmin states. Nothing is
    * corpus-cardinality but the scan.
    */
  def pqCodes(df: DataFrame, vecCol: String, idCol: String,
              codebooks: DataFrame, m: Int, subDim: Int): DataFrame =
    sliced(df, vecCol, idCol, m, subDim)
      .join(broadcast(pqCodebookArrays(codebooks)), Seq("__ss"))
      .withColumn("__d", l2Sq(col("__sv"), col("__cv"), subDim))
      .groupBy(col("__vid"), col("__ss"))
      .agg(min(struct(col("__d"), col("__cid"))).as("__m"))
      .select(col("__vid").as(idCol), col("__ss").cast("long").as("subspace"),
        col("__m.__cid").as("code"))
}
