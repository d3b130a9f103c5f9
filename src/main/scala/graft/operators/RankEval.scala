package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation between two rankings — the measurement
  * step every ANN/sparse-retrieval rollout needs before swapping an
  * approximate path in for the exact one: recall@k (how much of the true
  * top-k the approximate list found) and the reciprocal rank of the true
  * best hit (where the single most-relevant item landed).
  *
  * Scale shape: both inputs are pre-truncated per-query top-k lists, so
  * every join here is an equi-join on (query, neighbor) over q·k rows —
  * corpus size never appears. Aggregations are per-query counts with
  * map-side partials. Metrics are exact small-integer divisions rounded
  * to 4 decimals AFTER the division (the q26 rounding rule), so results
  * hash-match any engine doing the same arithmetic.
  */
object RankEval {

  /** Compare an approximate ranking against the exact one. Both inputs
    * carry (queryCol, rankCol, idCol); `exact` defines the query universe
    * and the truth set. Output per query, ordered by query:
    * (query, n_exact, n_overlap, recall_at_k, rr) where recall_at_k =
    * n_overlap / n_exact and rr = 1/rank of exact's rank-1 item in the
    * approximate list (0.0 when missed — the standard MRR convention).
    */
  def vsExact(approx: DataFrame, exact: DataFrame,
              queryCol: String, rankCol: String, idCol: String): DataFrame = {
    val e = exact.select(col(queryCol).as("__q"), col(rankCol).as("__er"),
      col(idCol).as("__n"))
    val a = approx.select(col(queryCol).as("__q"), col(rankCol).as("__ar"),
      col(idCol).as("__n"))
    val perQuery = e.groupBy(col("__q")).agg(count(lit(1)).as("n_exact"))
    val overlap = e.join(a.select(col("__q"), col("__n")), Seq("__q", "__n"))
      .groupBy(col("__q")).agg(count(lit(1)).as("n_overlap"))
    val top1InApprox = e.where(col("__er") === 1)
      .join(a, Seq("__q", "__n"), "left")
      .select(col("__q"),
        coalesce(round(lit(1.0) / col("__ar"), 4), lit(0.0)).as("rr"))
    perQuery
      .join(overlap, Seq("__q"), "left")
      .join(top1InApprox, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        col("n_exact"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") / col("n_exact"), 4)
          .as("recall_at_k"),
        coalesce(col("rr"), lit(0.0)).as("rr"))
      .orderBy(queryCol)
  }

  /** Pair-SET eval: precision/recall of a candidate pair table against a
    * ground-truth pair table — the measurement a dedup rollout runs to
    * commit LSH parameters (bands × rows): precision says how much
    * verification work the candidates waste, recall says how many true
    * duplicates the banding can ever find. Both inputs carry (aCol, bCol)
    * with a < b; one equi-join + three 1-row aggregates (the q58 shape).
    */
  def pairSetEval(candidates: DataFrame, truth: DataFrame,
                  aCol: String, bCol: String): DataFrame = {
    val c = candidates.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val t = truth.select(col(aCol).as("__a"), col(bCol).as("__b"))
    t.agg(count(lit(1)).as("n_true"))
      .crossJoin(c.agg(count(lit(1)).as("n_cand")))
      .crossJoin(c.join(t, Seq("__a", "__b")).agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        round(when(col("n_cand") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_cand")), 4).as("precision"),
        round(when(col("n_true") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_true")), 4).as("recall"))
  }
}
