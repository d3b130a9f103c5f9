package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the cheap dimensionality
  * reduction in front of ANN / clustering / dedup when the raw embedding
  * width is too expensive to shuffle: a Rademacher (±1/√k) projection
  * preserves pairwise Euclidean geometry in expectation (distortion
  * O(√(log n / k))), and unlike PCA it needs NO pass over the data to fit.
  *
  * The projection matrix is DETERMINISTIC: coefficient (o, i) is ±1 from
  * the md5 parity of "rp_o_i" (the [[Similarity.signPlaneComponent]]
  * family with its own seed tag), materialized at PLAN TIME as literals —
  * the projection is a pure scan→project pass, unrolled left-associated
  * codegen sums (the l2Sq precedent), no exchange, no UDF, replayable bit
  * for bit on any engine. At 100 TB this is a map-only pass whose output
  * is k/d of the input width; every downstream shuffle (bucketed ANN,
  * k-means, near-dup) gets k/d cheaper.
  */
object RandomProjection {

  /** The (outDim `o`, inDim `i`) Rademacher coefficient: +1 when the first
    * md5 nibble of "rp_o_i" is odd, else −1 (before the 1/√k scale).
    */
  def component(o: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp_${o}_$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 1) 1.0 else -1.0
  }

  /** out_o = round((Σ_i x_i·sign(o,i)) / √dimOut, 9) for o = 1..dimOut,
    * ascending-i left-associated sums — the pinned arithmetic both engines
    * replay exactly.
    *
    * Each output is a zip_with/aggregate LOOP over the sign array, not
    * dimIn unrolled terms: bitwise the same values (the fold's 0.0 seed
    * is absorbed by the first add), but dimOut×dimIn unrolled terms blow
    * the generated stage past HotSpot's JIT method limit and the whole
    * projection runs interpreted (the Pca.sExpr finding — 8×+ measured).
    */
  def projectExpr(vec: Column, dimIn: Int, dimOut: Int): Seq[Column] = {
    val v = vec.cast("array<double>")
    val scale = math.sqrt(dimOut.toDouble)
    (1 to dimOut).map { o =>
      val sArr = array((1 to dimIn).map(i => lit(component(o, i))): _*)
      val dot = aggregate(zip_with(v, sArr, (x, s) => x * s), lit(0.0), (a, x) => a + x)
      round(dot / lit(scale), 9)
    }
  }

  /** `(idCol, proj: array<double>[dimOut])` — one narrow projection, rows
    * of the wrong declared width excluded (the [[Pca]] contract).
    */
  def project(df: DataFrame, vecCol: String, idCol: String,
              dimIn: Int, dimOut: Int): DataFrame = {
    require(dimOut >= 1 && dimIn >= 1, s"dims must be >= 1, got $dimIn -> $dimOut")
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .where(size(col("__v")) === dimIn)
      .select(col(idCol), array(projectExpr(col("__v"), dimIn, dimOut): _*).as("proj"))
  }
}
