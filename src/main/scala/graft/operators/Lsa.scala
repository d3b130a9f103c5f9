package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Latent semantic analysis without a linear-algebra library: the top
  * right-singular vector of a SPARSE (row, col, value) matrix — e.g. the
  * TF-IDF term–document matrix — by power iteration on AᵀA, where each
  * half-step is ONE relational matvec:
  *
  *     u = A v    ⟺  join on col, sum per row
  *     w = Aᵀ u   ⟺  join on row, sum per col
  *
  * The (row, col, value) table IS the matrix; nothing is ever
  * densified, shuffle ∝ nnz per half-step, and the matvec aggregations
  * are map-side combinable — the same relational-linear-algebra shape as
  * [[Pca]]'s covariance accumulation and PageRank's rank push, here on
  * an arbitrary rectangular sparse matrix. Each half-step normalizes
  * (keeping magnitudes O(1) so the decimal accumulators never
  * overflow), with the norm held in-plan as a broadcast 1-row frame.
  *
  * Determinism doctrine (PageRank/q71, hardened round 9): matrix values
  * quantize to a 4-decimal grid on ingest (DECIMAL(18,4) — ≤5e-5
  * relative error on tf-idf-scaled weights, far below power-iteration
  * tolerance) and iterates live on a 9-decimal grid, so every matvec
  * product is EXACT in DECIMAL(29,13) and only the per-key sum rounds
  * (HALF_UP, in decimal) to 9. Quantizing the DOUBLE product instead
  * (the round-8 doctrine) hit exact .5e-9 ties at ~1e-4 per value,
  * where Spark rounds the shortest decimal repr and DuckDB the binary
  * value — 1-ulp divergences. Squared norms still round to 6 before
  * the DECIMAL(38,12) sum (tie probability there is ~1e-9: the summand
  * is not grid-aligned at the rounding scale), every emitted value
  * rounds to 9 — the DuckDB oracle replays the full unrolled iteration
  * bit-for-bit.
  *
  * Runs AT CALL TIME (the fit contract): per-iteration generations
  * persist and the previous unpersists, lineage stays one step deep.
  * Starting vector: all-ones over the columns (deterministic; for a
  * non-negative matrix like TF-IDF the iterate stays non-negative and
  * converges to the dominant component for generic spectra).
  */
object Lsa {

  /** Top-k columns of the leading right-singular direction after
    * `iterations` power steps: (term, loading), loading descending with
    * column-name tiebreak.
    */
  def topTermVector(matrix: DataFrame, rowCol: String, colCol: String,
                    valCol: String, iterations: Int = 2, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    termVector(matrix, rowCol, colCol, valCol, iterations)
      .orderBy(col("loading").desc, col("term")).limit(k)
  }

  /** Fold-in: every row projected onto the topic — score(row) =
    * Σ value·loading over its nonzeros, ONE more relational matvec.
    * Returns the top-k rows (row, topic_score), descending with row-id
    * tiebreak — the serving side ("which documents define this topic?").
    */
  def docScores(matrix: DataFrame, rowCol: String, colCol: String,
                valCol: String, iterations: Int = 2, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = termVector(matrix, rowCol, colCol, valCol, iterations)
      .withColumnRenamed("term", colCol)
    matrix.select(col(rowCol), col(colCol), col(valCol).cast("double").as("__v"))
      .join(v, Seq(colCol))
      .groupBy(col(rowCol))
      .agg(round(sum(col("__v").cast("decimal(18,4)") * col("loading").cast("decimal(10,9)")), 9)
        .cast("double").as("topic_score"))
      .orderBy(col("topic_score").desc, col(rowCol)).limit(k)
  }

  /** The FULL leading-direction estimate (term, loading) after
    * `iterations` power steps.
    */
  def termVector(matrix: DataFrame, rowCol: String, colCol: String,
                 valCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val a = matrix.select(col(rowCol).as("__r"), col(colCol).as("__c"),
        col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val v = powerIterate(a, iterations, Nil)
    a.unpersist()
    v.select(col("__c").as("term"), col("__x").as("loading"))
  }

  /** First `nTopics` right-singular directions by DEFLATED power
    * iteration — the multi-topic LSA. [[Pca.principalComponents]]
    * deflates by rewriting the (dense, narrow) residual rows; a sparse
    * term–document matrix cannot afford that (A − σuvᵀ is DENSE), so
    * deflation moves into the ITERATE instead — Hotelling orthogonal
    * iteration on AᵀA: after every AᵀA application the column-space
    * iterate subtracts its projection onto each previously-fitted topic
    *
    *     w ← w − (w·v_s)·v_s    for s < t, then normalize,
    *
    * which is one column-keyed join + a broadcast 1-row dot product per
    * prior topic — nothing densifies, shuffle stays ∝ nnz per half-step
    * plus ∝ |columns| per deflation. Topic 1 is exactly [[termVector]]'s
    * direction (empty deflation set).
    *
    * Determinism: the dot product quantizes products to DECIMAL(28,9)
    * and rounds to 9, the subtraction rounds to 9, then the standard
    * normalization — the DuckDB oracle (q159) replays the k=2 unroll
    * hash-exact. Every w-aggregation's support is the full distinct
    * column set of the matrix (each column groups whenever any of its
    * rows carries a u value, even 0.0 after rounding), so the deflation
    * joins are inner joins with no lost columns.
    *
    * Returns (topic, term, loading), topic = 1..nTopics.
    */
  def topicVectors(matrix: DataFrame, rowCol: String, colCol: String,
                   valCol: String, iterations: Int = 2, nTopics: Int = 2): DataFrame = {
    require(nTopics >= 1, s"nTopics must be >= 1, got $nTopics")
    val a = matrix.select(col(rowCol).as("__r"), col(colCol).as("__c"),
        col(valCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val topics = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    (1 to nTopics).foreach { _ =>
      topics += powerIterate(a, iterations, topics.toSeq)
    }
    a.unpersist()
    topics.zipWithIndex.map { case (t, i) =>
      t.select(lit((i + 1).toLong).as("topic"),
        col("__c").as("term"), col("__x").as("loading"))
    }.reduce(_ unionByName _)
  }

  /** Top-k terms per topic of [[topicVectors]]: (topic, term, loading),
    * loading descending with term tiebreak within each topic. The rank
    * window partitions by topic — vocabulary-bounded, never corpus-bounded.
    */
  def topTopicVectors(matrix: DataFrame, rowCol: String, colCol: String,
                      valCol: String, iterations: Int = 2, nTopics: Int = 2,
                      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    topicVectors(matrix, rowCol, colCol, valCol, iterations, nTopics)
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("topic"))
          .orderBy(col("loading").desc, col("term"))))
      .where(col("__rank") <= k).drop("__rank")
      .orderBy(col("topic"), col("loading").desc, col("term"))
  }

  /** `iterations` power steps on AᵀA starting from all-ones over the
    * columns, orthogonalizing each column-space iterate against
    * `deflate` (previously-fitted topic vectors) before normalizing.
    * Returns the final (__c, __x) PERSISTED (callers building on it —
    * fold-in, the next deflation round — reuse it without recompute).
    */
  private def powerIterate(a: DataFrame, iterations: Int,
                           deflate: Seq[DataFrame]): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // localCheckpoint, not bare persist: each iteration's plan references
    // the previous generation ~8× (norm + deflation dots each re-reference
    // their input), so without lineage TRUNCATION the logical plan grows
    // 8^iterations — analysis alone OOMs past ~3 deflated iterations.
    // The checkpoint materializes the O(|columns|) vector and cuts the
    // plan to a scan; one-generation storage, same as the persist it
    // replaces.
    // the all-ones INIT is not checkpointed: its plan is one distinct
    // over the already-persisted matrix and iteration 1 references it
    // only twice — materializing it separately just adds a job; only the
    // per-iteration generations (referenced ~8× under deflation) need
    // the lineage cut
    var v = a.select(col("__c")).distinct().withColumn("__x", lit(1.0))
    var i = 0
    while (i < iterations) {
      // EXACT-decimal matvec products: the matrix values are a 4-decimal
      // grid and the iterate a 9-decimal grid, so v·x is exact at 13
      // decimals in decimal(29,13) — quantizing the DOUBLE product (the
      // old decimal(28,9) cast) hit exact .5e-9 ties at ~1e-4 per value,
      // where Spark (shortest-repr) and DuckDB (binary) round apart.
      // One deterministic HALF_UP round of the exact sum replaces it.
      val uRaw = a.join(v, Seq("__c"))
        .groupBy(col("__r"))
        .agg(round(sum(col("__v").cast("decimal(18,4)") * col("__x").cast("decimal(10,9)")), 9)
          .cast("double").as("__u"))
      val un = uRaw.agg(
        sqrt(sum(round(col("__u") * col("__u"), 6).cast("decimal(38,12)"))
          .cast("double")).as("__n"))
      val u = uRaw.crossJoin(broadcast(un))
        .select(col("__r"), round(col("__u") / col("__n"), 9).as("__u"))
      val wRaw = a.join(u, Seq("__r"))
        .groupBy(col("__c"))
        .agg(round(sum(col("__v").cast("decimal(18,4)") * col("__u").cast("decimal(10,9)")), 9)
          .cast("double").as("__w"))
      // Hotelling deflation: strip each prior topic's component out of
      // the raw column iterate, one broadcast dot per topic. FULLY
      // decimal arithmetic, rounding in DECIMAL, double only at the end:
      // w, d and p are 9-decimal grid values, so w − d·p lands EXACTLY on
      // the .5e-9 half-grid for many components — rounding the DOUBLE
      // there is engine-dependent (Spark rounds the shortest decimal
      // repr, DuckDB the binary value) and diverged by 1 ulp at sf0.01.
      // decimal(20,9) × decimal(10,9) → decimal(31,18) stays exact in
      // BOTH engines (no precision-loss adjustment below 38); |w|, |d|
      // < 10^11 is the documented magnitude bound.
      val wDef = deflate.foldLeft(wRaw) { (w, p) =>
        val pp = p.select(col("__c"), col("__x").as("__p"))
        val d = w.join(pp, Seq("__c"))
          .agg(round(sum(col("__w").cast("decimal(20,9)") * col("__p").cast("decimal(10,9)")), 9)
            .cast("double").as("__d"))
        w.join(pp, Seq("__c"))
          .crossJoin(broadcast(d))
          .select(col("__c"),
            round(col("__w").cast("decimal(20,9)")
              - col("__d").cast("decimal(20,9)") * col("__p").cast("decimal(10,9)"), 9)
              .cast("double").as("__w"))
      }
      val wn = wDef.agg(
        sqrt(sum(round(col("__w") * col("__w"), 6).cast("decimal(38,12)"))
          .cast("double")).as("__n"))
      val next = wDef.crossJoin(broadcast(wn))
        .select(col("__c"), round(col("__w") / col("__n"), 9).as("__x"))
        .localCheckpoint(true)
      v.unpersist()
      v = next
      i += 1
    }
    v
  }
}
