package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch — the bounded-memory frequency summary next to the
  * engine's exact term statistics (q47) and its KMV/HLL cardinality
  * sketches (q58): a d×w counter grid any serving system can hold in
  * memory and query for "roughly how often does this token occur?"
  * without shipping the vocabulary table. Estimates are upward-biased
  * (`est ≥ true`, within εN with probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉ — Cormode & Muthukrishnan, J.Alg 2005).
  *
  * Relational build shape: the corpus tokenizes ONCE into the exact
  * (token, count) aggregation (the q47 shuffle — bounded by vocabulary,
  * not corpus), then each distinct token fans out to its d (row, bucket)
  * cells and counts sum per cell: the sketch-build exchange carries
  * d×w cells after map-side combine, and the FINISHED sketch is d×w rows
  * — the exportable artifact. (A streaming ingest would add occurrences
  * to cells directly; relationally the pre-aggregation is strictly
  * cheaper because the token table is already narrower than the stream.)
  *
  * Determinism / engine parity: cell hashing is the [[Sampling.bucket]]
  * md5 family with the depth index as salt — `bucket(r, tok) =
  * int(md5(r || '_' || tok)[0:12]) mod w` — a pure row function any
  * md5-capable engine replays; no seeds, no JVM hashing.
  */
object Sketch {

  /** The d-row salted md5 cell index in [0, w). 12 hex chars = 48 bits —
    * unbiased mod w for any sane width.
    */
  def cmsBucket(row: Int, tok: Column, width: Int): Column =
    (conv(substring(md5(concat(lit(row.toString), lit("_"), tok)), 1, 12), 16, 10)
      .cast("long") % width).cast("long")

  /** Build the sketch over whitespace-lowered tokens of `textCol`:
    * one row per NON-EMPTY cell `(depth, bucket, cnt)` (absent cells are
    * zero). `depth` ∈ [0, d), `bucket` ∈ [0, w).
    */
  def countMinSketch(df: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val counts = df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    counts
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).cast("long").as("depth"),
          cmsBucket(r, col("__tok"), width).as("bucket"))): _*)).as("__cell"),
        col("__cnt"))
      .groupBy(col("__cell.depth").as("depth"), col("__cell.bucket").as("bucket"))
      .agg(sum(col("__cnt")).as("cnt"))
  }

  /** Point-estimate each query token's frequency from a stored sketch:
    * `est = min over d rows of cell(r, h_r(tok))` — the CMS guarantee
    * `est ≥ true count` holds for every token (missing cells read 0,
    * which only happens for tokens absent from the build). The sketch
    * (≤ d×w rows) broadcasts; the query table never shuffles.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, tokCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val cells = queries
      .select(col(tokCol).as("__tok"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).cast("long").as("depth"),
            cmsBucket(r, col(tokCol), width).as("bucket"))): _*)).as("__cell"))
      .select(col("__tok"), col("__cell.depth").as("depth"), col("__cell.bucket").as("bucket"))
    cells
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col("__tok").as("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Per-group KMV (k-minimum-values) distinct-count sketch — q58's
    * global estimator partitioned: keep each group's k smallest distinct
    * 60-bit md5 hashes, estimate `(k-1)·2^60 / kth_smallest` (exact
    * `k_seen` when a group has fewer than k distinct keys).
    *
    * Scale shape: the rank filter `row_number() <= k` over
    * (group, hash-asc) is rewritten by Spark's InferWindowGroupLimit
    * into a PARTIAL WindowGroupLimit before the exchange and a final one
    * after — each map task forwards at most k rows per group, so the
    * shuffle carries ≤ k·groups·partitions rows instead of every
    * distinct hash: the per-group form of q58's TakeOrderedAndProject
    * reduce, and exactly how a 100-TB "distinct users per day" sweep
    * should plan. Returns (groupCol, k_seen, kth_hash, est_nd).
    */
  def kmvPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val m = math.pow(2.0, 60) // the 15-hex-char hash range
    val hashed = df
      .select(col(groupCol),
        conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
          .cast("long").as("__h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(max(col("__h")).as("kth_hash"), count(lit(1)).as("k_seen"))
      .select(col(groupCol), col("k_seen"), col("kth_hash"),
        when(col("k_seen") < k, col("k_seen").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * m / col("kth_hash"), 2))
          .as("est_nd"))
  }
}
