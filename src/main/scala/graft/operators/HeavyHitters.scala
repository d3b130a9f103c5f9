package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters with Misra–Gries candidate pruning (Misra & Gries
  * 1982; the "candidate + exact verify" production pattern) — the
  * bounded-state sibling of the count-min sketch ([[Sketch]]): CMS
  * answers "roughly how often does THIS token occur" from a fixed-size
  * summary; this operator answers "which tokens dominate the corpus,
  * with EXACT counts" while never shuffling the distinct-token table.
  * Reference scope: the reference ETL (dags/sri_vehiculos_etl_dag.py)
  * has no frequency mining; this extends the LLM-training-data shelf
  * (stopword discovery, boilerplate token detection, vocabulary-cap
  * planning) the engine adds on top of it.
  *
  * Scale shape — why not just groupBy(token).count().orderBy? That
  * shuffles ONE ROW PER DISTINCT TOKEN (map-side combined, but at 100 TB
  * the distinct cardinality is billions). Here:
  *
  *   1. '''candidates''': one pass of Misra–Gries with k counters PER
  *      PARTITION (`mapPartitions` — genuinely procedural streaming
  *      state, the rare case the relational API cannot express), each
  *      partition emitting <= k surviving tokens. Shuffle ∝ partitions×k,
  *      independent of distinct cardinality.
  *   2. '''verify''': the token stream counts ONLY the broadcast
  *      candidate set (semi-join filter before the aggregation), so the
  *      exact-count shuffle is also ∝ candidates, and the count is
  *      map-side combinable.
  *   3. '''threshold''': keep tokens with exact cnt·(k+1) > n (pure
  *      integer — no division, no float), rank (cnt desc, tok asc). At
  *      most k such tokens exist, so the rank window is the q88-bounds
  *      class of global window.
  *
  * Correctness THEOREM (what makes the pruning safe under ANY
  * partitioning, spec-pinned): Misra–Gries with k counters retains every
  * token whose local count exceeds n_i/(k+1) (its estimate undercounts
  * by at most n_i/(k+1) < its true count, so the counter is positive at
  * partition end). If a token's GLOBAL count exceeds n/(k+1) = Σn_i/(k+1),
  * then by pigeonhole its local count exceeds n_i/(k+1) in at least one
  * partition — so it survives there and reaches the candidate union.
  * Candidates ⊇ true heavy hitters for EVERY partitioning; the verify
  * join then makes the OUTPUT exactly "all tokens with cnt·(k+1) > n,
  * exact counts" — a data-defined set, independent of partitioning,
  * which is what lets DuckDB replay it as a plain GROUP BY … HAVING.
  */
object HeavyHitters {

  /** The Misra–Gries kernel: stream `it` through k counters, return the
    * surviving (token, residual count) pairs. Residuals are NOT true
    * counts (undercounted by <= n_i/(k+1)); only survival matters here.
    */
  private[operators] def misraGries(it: Iterator[String], k: Int): Map[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val t = it.next()
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None =>
          if (counters.size < k) counters.update(t, 1L)
          else {
            // decrement-all step; drop zeros. Amortized O(1) per element
            // (each decrement pays back an earlier increment).
            val dead = new scala.collection.mutable.ArrayBuffer[String]
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.foreach { case (key, c) => if (c == 0L) dead += key }
            dead.foreach(counters.remove)
          }
      }
    }
    counters.toMap
  }

  /** Exact heavy hitters of a single-column token frame: all tokens with
    * exact count·(k+1) > total tokens, with exact counts, ranked
    * (cnt desc, tok asc). Output: (tok STRING, cnt LONG, rank LONG) —
    * at most k rows.
    */
  def ofTokens(toks: DataFrame, tokCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = toks.sparkSession
    import spark.implicits._
    // materialize the token projection once: the candidate pass and the
    // verify count both read it, and upstream may be an expensive split
    val t = toks.select(col(tokCol).cast("string").as("tok"))
      .where(col("tok").isNotNull)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = t.as[String]
      .mapPartitions(it => misraGries(it, k).keysIterator)
      .toDF("tok").distinct()
    val total = t.groupBy().agg(count(lit(1)).as("__n"))
    t.join(broadcast(candidates), Seq("tok")) // semi-join shape: candidate tokens only
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * (k + 1) > col("__n"))
      .select(col("tok"), col("cnt"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))).cast("long").as("rank"))
  }

  /** Convenience form over a text column: whitespace-lowered tokens, the
    * [[Bpe.wordTable]] normalization.
    */
  def ofText(df: DataFrame, textCol: String, k: Int): DataFrame =
    ofTokens(
      df.where(col(textCol).isNotNull)
        .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
        .where(col("tok") =!= ""),
      "tok", k)
}
