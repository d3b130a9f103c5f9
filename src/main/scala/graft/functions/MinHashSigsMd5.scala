package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash signature kernel: the FULL md5-family signature of
  * one document — all `numHashes` minima over its word k-shingles — in ONE
  * per-row pass, replacing the explodedShingles → md5 → 64-way min-agg
  * pipeline inside [[graft.operators.Dedup.minhashSignaturesMd5]] (r16
  * optimization round).
  *
  * Why fuse (guide §1.2 "per-task work", §4 expression choice): the
  * relational form pays, PER SHINGLE, a generator `InternalRow`
  * allocation, an UnsafeRow conversion, and a 64-expression aggregation
  * hash-map probe — all to compute 64 running minima whose state is 64
  * longs per document. The fused kernel walks the shingles once, hashes
  * each md5 prefix through the 64 affine maps, and keeps the minima in a
  * local array: no Generate, no aggregation, no exchange for the
  * signature stage at all (the groupBy(id) disappears — each input row
  * maps straight to its signature row).
  *
  * Bit-identical by construction, spec-pinned against the relational
  * formulation: the tokenize walk calls the SAME `UTF8String` methods
  * (space-only trim, locale-independent lowercase, identical `\s+` regex
  * split, identical truncated-short-doc shingle rule) as [[WordShingles]],
  * the digest is the same commons-codec lowercase hex md5 Spark's `md5`
  * expression computes, the 7-hex-digit prefix parse equals
  * `conv(substring(md5, 1, 7), 16, 10)` on that digest, and the affine
  * maps share [[graft.operators.Dedup.minhashMd5Coeffs]]. h < 16^7 and
  * a < 2^31 keep every h·a + b below 2^59 — no overflow, and `%` on
  * nonnegative longs is the same remainder in both forms.
  *
  * CONTRACT (inherited from the groupBy form it replaces): one input row
  * per document id — the callers key by a unique id column. Null text
  * yields a null signature (callers filter `text IS NOT NULL` upstream,
  * the explodedShingles contract).
  */
case class MinHashSigsMd5(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs_md5 requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val splitPattern = UTF8String.fromString("\\s+")
  private val space = UTF8String.fromString(" ")
  // the shared affine family — same coefficients the DuckDB oracle
  // generator and the relational formulation use
  @transient private lazy val coeffA: Array[Long] =
    Array.tabulate(numHashes)(i => graft.operators.Dedup.minhashMd5Coeffs(i)._1)
  @transient private lazy val coeffB: Array[Long] =
    Array.tabulate(numHashes)(i => graft.operators.Dedup.minhashMd5Coeffs(i)._2)
  private val P = 2147483647L // 2^31 - 1, the family's Mersenne modulus

  protected override def nullSafeEval(t: Any): Any = {
    val words = t.asInstanceOf[UTF8String].trim().toLowerCase().split(splitPattern, -1)
    val n = words.length
    // trailing sub-shingles drop, except the single truncated shingle of a
    // document shorter than k words — the WordShingles rule
    val last = math.max(n - k + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val a = coeffA; val b = coeffB
    var i = 0
    while (i < last) {
      val m = math.min(k, n - i)
      val sl = new Array[UTF8String](m)
      System.arraycopy(words, i, sl, 0, m)
      val sh = UTF8String.concatWs(space, sl: _*)
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(sh.getBytes)
      val h = java.lang.Long.parseLong(hex.substring(0, 7), 16)
      var j = 0
      while (j < numHashes) {
        val v = (h * a(j) + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def withNewChildInternal(newChild: Expression): MinHashSigsMd5 =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs_md5"
}

object MinHashSigsMd5 {
  /** Column-API entry point: array<long> of the `numHashes` signature
    * minima of `text`'s word k-shingles. */
  def minhashSigsMd5(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigsMd5(ColumnBridge.expression(text), k, numHashes))
}
