package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-engine logistic-regression training — the quality-classifier shape
  * of LLM data curation (fastText-style filters: fit a small linear model
  * on cheap engineered features, score the corpus, keep the top band).
  *
  * Batch gradient descent where EACH ITERATION IS ONE AGGREGATION: the
  * gradient of the log-loss, `g_j = Σ_i (σ(w·x_i) − y_i) · x_ij`, is a
  * map-side-combinable sum per feature, so an iteration costs one scan
  * and one scalar-row collect of d+1 sums — the Bpe.train / PQ-codebook
  * driver-iteration pattern (weights are d+1 scalars, never data). No
  * gradient ever shuffles row-level state; 1000 executors see the same
  * plan shape as local[32], and the scan is one cached narrow projection.
  *
  * Determinism / engine parity (the PageRank doctrine, adapted to a
  * transcendental): `exp` is the one step libm implementations may
  * disagree on by an ulp, so the sigmoid is rounded to 9 decimals PER
  * ROW before it enters the gradient — after that every product is
  * IEEE-defined on identical inputs, the gradient accumulates in
  * DECIMAL(28,12) (partition-order-invariant exact addition), and each
  * weight update rounds to 9 decimals half-away-from-zero (both engines'
  * `round`). The DuckDB oracle replays the full training unrolled and
  * matches hash-exactly.
  */
object LogReg {

  /** `iters` batch-GD steps from w = 0 at learning rate `lr` over
    * `features` (name → column; a bias term is prepended automatically)
    * against binary `label` (cast to 0.0/1.0 double). Returns the fitted
    * model as (feature, weight) rows.
    *
    * Training runs AT CALL TIME (one Spark job per iteration) — this is
    * a fit, not a lazy query; the returned frame is a local literal.
    */
  def fit(df: DataFrame, features: Seq[(String, Column)], label: Column,
          iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val (names, w) = fitWeights(df, features, label, iters, lr)
    import spark.implicits._
    names.zip(w).toDF("feature", "weight")
  }

  /** The driver-side fit loop shared by [[fit]] and [[scoreAll]]:
    * returns (feature names incl. bias, fitted weights).
    */
  def fitWeights(df: DataFrame, features: Seq[(String, Column)], label: Column,
                 iters: Int, lr: Double): (Seq[String], Array[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val feats = ("bias", lit(1.0)) +: features
    val base = df
      .select(feats.map { case (n, c) => c.cast("double").as(n) } :+
        label.cast("double").as("__y"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(feats.size)(0.0)
    var i = 0
    while (i < iters) {
      val p = sigmoid9(feats.map(_._1).zip(w.toSeq))
      val aggs = feats.map { case (n, _) =>
        sum(((p - col("__y")) * col(n)).cast("decimal(28,12)")).as("g_" + n)
      } :+ count(lit(1)).as("__n")
      val row = base.agg(aggs.head, aggs.tail: _*).head
      val n = row.getLong(feats.size)
      require(n > 0, "LogReg.fit: training input has no rows after feature projection")
      w = w.zipWithIndex.map { case (wj, j) =>
        // a null sum here means either every feature value was null or the
        // decimal(28,12) accumulator overflowed (ansi off nulls instead of
        // throwing) — both are caller errors worth naming, not NPEs
        val g = Option(row.getDecimal(j)).getOrElse(throw new IllegalArgumentException(
          s"LogReg.fit: gradient sum for '${feats(j)._1}' is null — " +
            "all-null feature values or decimal(28,12) overflow")).doubleValue
        roundHalfAway(wj - lr * (g / n), 9)
      }
      i += 1
    }
    base.unpersist()
    (feats.map(_._1), w)
  }

  /** Mini-batch / multi-epoch GD under the same determinism doctrine as
    * [[fit]]: rows are assigned to `batches` DETERMINISTIC mini-batches by
    * the md5 bucket of their id ([[Sampling.bucket]] % batches — a pure
    * row function, so the batch split is identical on any engine and any
    * partitioning; no shuffled shuffle-of-rows randomness to replay). An
    * epoch is `batches` sequential steps, each ONE map-side-combinable
    * filtered gradient aggregation over that batch's rows + a d+1-scalar
    * collect; weights update with lr·g/n_b and round to 9 decimals, so
    * the whole `epochs × batches`-step trajectory replays exactly in the
    * DuckDB oracle. The projected base persists once — every step is a
    * filter over the cached projection, never a re-read of the corpus.
    */
  def fitMiniBatch(df: DataFrame, idCol: String, features: Seq[(String, Column)],
                   label: Column, epochs: Int = 2, batches: Int = 2,
                   lr: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    val (names, w) = fitWeightsMiniBatch(df, idCol, features, label, epochs, batches, lr)
    import spark.implicits._
    names.zip(w).toDF("feature", "weight")
  }

  /** The driver-side mini-batch loop behind [[fitMiniBatch]]. */
  def fitWeightsMiniBatch(df: DataFrame, idCol: String, features: Seq[(String, Column)],
                          label: Column, epochs: Int, batches: Int,
                          lr: Double): (Seq[String], Array[Double]) = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(batches >= 1 && batches <= Sampling.Buckets,
      s"batches must be in [1, ${Sampling.Buckets}], got $batches")
    val feats = ("bias", lit(1.0)) +: features
    val base = df
      .select(feats.map { case (n, c) => c.cast("double").as(n) } ++
        Seq(label.cast("double").as("__y"),
          (Sampling.bucket(col(idCol)) % batches).as("__b")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var w = Array.fill(feats.size)(0.0)
    var step = 0
    while (step < epochs * batches) {
      val b = step % batches
      val p = sigmoid9(feats.map(_._1).zip(w.toSeq))
      val aggs = feats.map { case (n, _) =>
        sum(((p - col("__y")) * col(n)).cast("decimal(28,12)")).as("g_" + n)
      } :+ count(lit(1)).as("__n")
      val row = base.where(col("__b") === b).agg(aggs.head, aggs.tail: _*).head
      val n = row.getLong(feats.size)
      require(n > 0,
        s"LogReg.fitMiniBatch: batch $b of $batches is empty — fewer rows than batches?")
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = Option(row.getDecimal(j)).getOrElse(throw new IllegalArgumentException(
          s"LogReg.fitMiniBatch: gradient sum for '${feats(j)._1}' is null — " +
            "all-null feature values or decimal(28,12) overflow")).doubleValue
        roundHalfAway(wj - lr * (g / n), 9)
      }
      step += 1
    }
    base.unpersist()
    (feats.map(_._1), w)
  }

  /** Fit on `df`, then score EVERY row: (idCol, per-feature…, keep…,
    * score) with score = the 6-decimal-rounded fitted probability. The
    * scoring pass is a pure projection over the corpus — the fitted
    * weights ride in as literals, so the plan after training is
    * scan → project, no join. `keep` carries extra projected columns
    * (e.g. the label, for a downstream [[ClassifierEval]] pass) through
    * the scoring projection without affecting the fit.
    */
  def scoreAll(df: DataFrame, idCol: String, features: Seq[(String, Column)],
               label: Column, iters: Int = 3, lr: Double = 0.5,
               keep: Seq[(String, Column)] = Nil): DataFrame = {
    val (names, w) = fitWeights(df, features, label, iters, lr)
    val feats = ("bias", lit(1.0)) +: features
    val projected = df.select(
      col(idCol) +: (feats.map { case (n, c) => c.cast("double").as(n) } ++
        keep.map { case (n, c) => c.as(n) }): _*)
    projected
      .withColumn("score", round(sigmoid9(names.zip(w.toSeq)), 6))
      .drop("bias")
  }

  /** σ(w·x) with the per-row 9-decimal rounding that makes the value
    * engine-portable (see class doc). `z` builds left-associatively so
    * the double addition order is pinned.
    */
  private def sigmoid9(terms: Seq[(String, Double)]): Column = {
    val z = terms.map { case (n, wi) => lit(wi) * col(n) }.reduce(_ + _)
    round(lit(1.0) / (lit(1.0) + exp(negate(z))), 9)
  }

  /** Round half away from zero — the behavior of both Spark's and
    * DuckDB's `round(x, d)`, applied to the driver-side weight update.
    */
  private def roundHalfAway(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}
