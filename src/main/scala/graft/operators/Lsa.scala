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
  * Determinism doctrine (PageRank/q71): products quantize to
  * DECIMAL(28,9) before summing, squared norms round to 6 before the
  * DECIMAL(38,12) sum, every emitted value rounds to 9 — the DuckDB
  * oracle replays the full unrolled iteration bit-for-bit.
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
      .agg(round(sum((col("__v") * col("loading")).cast("decimal(28,9)"))
        .cast("double"), 9).as("topic_score"))
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
    var v = a.select(col("__c")).distinct().withColumn("__x", lit(1.0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count()
    var i = 0
    while (i < iterations) {
      val uRaw = a.join(v, Seq("__c"))
        .groupBy(col("__r"))
        .agg(round(sum((col("__v") * col("__x")).cast("decimal(28,9)"))
          .cast("double"), 9).as("__u"))
      val un = uRaw.agg(
        sqrt(sum(round(col("__u") * col("__u"), 6).cast("decimal(38,12)"))
          .cast("double")).as("__n"))
      val u = uRaw.crossJoin(broadcast(un))
        .select(col("__r"), round(col("__u") / col("__n"), 9).as("__u"))
      val wRaw = a.join(u, Seq("__r"))
        .groupBy(col("__c"))
        .agg(round(sum((col("__v") * col("__u")).cast("decimal(28,9)"))
          .cast("double"), 9).as("__w"))
      val wn = wRaw.agg(
        sqrt(sum(round(col("__w") * col("__w"), 6).cast("decimal(38,12)"))
          .cast("double")).as("__n"))
      val next = wRaw.crossJoin(broadcast(wn))
        .select(col("__c"), round(col("__w") / col("__n"), 9).as("__x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      v.unpersist()
      v = next
      i += 1
    }
    a.unpersist()
    v.select(col("__c").as("term"), col("__x").as("loading"))
  }
}
