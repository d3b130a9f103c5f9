package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator: content-defined chunks of a text column —
  * the compiled kernel of [[graft.operators.Cdc.chunks]], one output row
  * per non-empty chunk as (chunk_ix LONG from 0, chunk STRING).
  *
  * Why a custom generator instead of the array-HOF formulation
  * (split → transform codes → filter hash → zip_with slices →
  * posexplode): higher-order-function lambdas evaluate INTERPRETED per
  * element — the 8-term rolling hash walked the expression tree ~100
  * nodes per position, measured **14 s for 5,000 documents on one input
  * partition** (and the `bounds` subtree evaluates twice, once under
  * `starts` and once under `ends`). This generator is the shape a
  * hand-written engine picks: ONE compiled pass per document (char
  * codes read once, w int multiplies per position, slices emitted
  * straight into generate output rows) — same asymptotics, ~50× less
  * constant. Semantics are IDENTICAL to the relational formulation and
  * the q208 DuckDB oracle (spec-pinned against a driver reference):
  * H(i) = Σ_{j<w} code(t[i−j])·B^j, boundary iff H % D == 0, slices
  * between boundaries, empty slices dropped. Positions are UTF-16
  * units — equal to code points on the documented ASCII domain (the
  * oracle guards non-ASCII with error()).
  */
case class CdcChunks(child: Expression, window: Int, base: Long, divisor: Long)
    extends UnaryExpression with Generator with CodegenFallback {

  require(window >= 2, s"window must be >= 2, got $window")
  require(base >= 2 && divisor >= 2, "base and divisor must be >= 2")
  require(127.0 * math.pow(base.toDouble, (window - 1).toDouble) * window < Long.MaxValue.toDouble,
    "hash terms must fit a 64-bit long without modular reduction")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string input, got ${other.catalogString}")
  }

  override def elementSchema: StructType = new StructType()
    .add("chunk_ix", LongType, nullable = false)
    .add("chunk", StringType, nullable = false)

  private val pows: Array[Long] =
    (0 until window).map(j => math.pow(base.toDouble, j.toDouble).toLong).toArray

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val s = t.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return Nil
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](4)
    var ix = 0L
    var start = 0 // 0-based exclusive start of the current chunk
    var i = window // 1-based candidate end position
    while (i <= n) {
      var h = 0L
      var j = 0
      while (j < window) { h += s.charAt(i - 1 - j).toLong * pows(j); j += 1 }
      if (h % divisor == 0) {
        if (i > start) { // empty slices (boundary at a boundary) dropped
          out += InternalRow(ix, UTF8String.fromString(s.substring(start, i)))
          ix += 1
        }
        start = i
      }
      i += 1
    }
    if (n > start) {
      out += InternalRow(ix, UTF8String.fromString(s.substring(start, n)))
    }
    out
  }

  override def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  /** Column-API entry point: one row per content-defined chunk of
    * `text` — (chunk_ix, chunk).
    */
  def cdcChunks(text: Column, window: Int, base: Long, divisor: Long): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), window, base, divisor))
}
