package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe (out-of-fold) target encoding — the feature-engineering
  * op that turns a high-cardinality categorical column into the
  * smoothed mean of a numeric target WITHOUT letting any row see its own
  * label: rows are dealt into `folds` deterministic md5 folds (the
  * q44/Sampling.bucket hash family), and a row in fold f is encoded
  * from the statistics of every OTHER fold —
  *
  *   enc = (catSum − foldSum_f + prior·m) / (catCnt − foldCnt_f + m)
  *
  * with `prior` the global target mean and `m` the smoothing
  * pseudo-count (unseen/rare categories shrink toward the prior). This
  * is the q120 split-leakage doctrine applied to feature construction:
  * naive same-table target encoding is a classic train-time leak.
  *
  * Scale shape: ONE map-side-combinable aggregation bounded by
  * (categories × folds), a 1-row global prior kept in-plan broadcast
  * (the q43 shape), and two broadcast joins back onto the rows — the
  * row table shuffles ZERO times (spec-pinned: the only exchanges below
  * the final projection are the bounded aggregations). Target sums
  * accumulate as DECIMAL(28,9); the final smoothing arithmetic is plain
  * IEEE doubles on identical inputs, rounded to 9 — the DuckDB oracle
  * replays it exactly.
  */
object TargetEncode {

  /** The deterministic fold of an id — 48 md5 bits mod `folds`. */
  def fold(idCol: org.apache.spark.sql.Column, folds: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(idCol.cast("string")), 1, 12), 16, 10)
      .cast("long") % folds).cast("long")

  /** Returns (idCol, catCol, fold, encoded) — one row per input row with
    * a non-null id; null categories form their own encodable class.
    */
  def outOfFold(df: DataFrame, catCol: String, targetCol: String, idCol: String,
                folds: Int = 5, smoothing: Double = 20.0): DataFrame = {
    require(folds >= 2, s"need >= 2 folds for out-of-fold stats, got $folds")
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    val rows = df.select(col(idCol),
        coalesce(col(catCol).cast("string"), lit("__null__")).as("__cat"),
        col(targetCol).cast("double").as("__y"),
        fold(col(idCol), folds).as("fold"))
      .where(col("__y").isNotNull)
    // ONE broadcast stats table instead of three (r17 opt). The old form
    // broadcast byCatFold, byCat and the prior separately; broadcast
    // builds run CONCURRENTLY on the exchange thread pool, so the three
    // builds raced to compute the shared aggregation underneath and each
    // re-ran the full rows scan + per-row md5 fold hashing (probe: 4
    // corpus passes for q152, three of them ~0.4 s broadcast-build jobs;
    // a persist cannot fix a concurrent first-materialization race).
    // Folding everything into one (category × fold)-row stats table puts
    // all three aggregation levels in ONE build plan, where the byCat and
    // prior levels stack over byCatFold's exchange and ReuseExchange
    // dedupes the scan. Plan: 4 scans of df → 2 (stats build + row join),
    // 3 broadcast exchanges → 1.
    //
    // The prior also now derives from the per-category sums, not a rescan:
    // decimal addition is exact and associative, so sum(cs)/sum(cc) over
    // the category rollup is bit-identical to sum(__y)/count(*) over rows
    // — same decimal total, same single double division.
    val byCatFold = rows.groupBy(col("__cat"), col("fold"))
      .agg(sum(col("__y").cast("decimal(28,9)")).as("fs"),
        count(lit(1)).as("fc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EAGER materialization of the bounded stats (categories × folds
    // rows): broadcast builds run concurrently, so a lazy cache is a
    // first-materialization RACE — each nested build re-ran the full scan
    // + md5 fold hashing underneath (measured: three ~0.4-0.6 s 11-task
    // build jobs for q152; AQE's runtime stage cache does not span
    // concurrently-built broadcast subtrees either). One count()
    // materializes the table before any consumer; every build then reads
    // the 25 cached rows. Freed by caller cache hygiene (the FuzzyJoin
    // variants precedent).
    byCatFold.count()
    val byCat = byCatFold.groupBy(col("__cat"))
      .agg(sum(col("fs")).as("cs"), sum(col("fc")).as("cc"))
    val prior = byCat.agg(
      (sum(col("cs")).cast("double") / sum(col("cc"))).as("__prior"))
    val stats = byCatFold.join(byCat, Seq("__cat")).crossJoin(prior)
    rows
      .join(broadcast(stats), Seq("__cat", "fold"))
      .select(col(idCol), col("__cat").as(catCol), col("fold"),
        round(((col("cs") - col("fs")).cast("double")
            + col("__prior") * smoothing)
          / ((col("cc") - col("fc")).cast("double") + smoothing), 9)
          .as("encoded"))
  }
}
