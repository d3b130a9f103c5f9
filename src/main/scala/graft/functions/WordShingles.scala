package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator: word k-shingles of a text column, one
  * output row per shingle occurrence — the engine of
  * [[graft.operators.TextAnalysis.explodedShingles]].
  *
  * Why a custom generator instead of composing builtins: every relational
  * formulation of shingling pays a structural tax somewhere —
  *
  *   - posexplode + lead window: a corpus-cardinality EXCHANGE before a
  *     single shingle exists (the doc-keyed window);
  *   - explode(sequence) beside the kept word array: the Generate
  *     operator serializes the ENTIRE word array into every exploded
  *     row's UnsafeRow buffer — O(words²) bytes per document;
  *   - transform(...) HOF array: row-local, but higher-order-function
  *     lambdas run interpreted per element, measured 60× slower.
  *
  * This generator is the shape a hand-written engine would pick: ONE
  * compiled pass per document (trim → lowercase → regex split → sliding
  * concat), emitting narrow (shingle) rows straight into the generate
  * output. No exchange, no quadratic row buffers, no per-element
  * interpretation. It deliberately calls the same `UTF8String` methods
  * the builtin `split(trim(lower(text)), "\\s+")` chain compiles to —
  * trim is space-only, lowercase is locale-independent, split is the
  * identical regex path — so its output is bit-identical to the
  * relational formulations and the DuckDB oracles (spec-pinned against a
  * lead-window reference on every edge case).
  *
  * Edge semantics (shared with the oracles): trailing sub-shingles are
  * dropped except the single truncated shingle of a document shorter
  * than k words; null text generates nothing.
  *
  * `withPos = true` widens the output to (__sh, __pos, __len): the
  * 1-based start position of the shingle in the document's token stream
  * and the shingle's actual word count (< k only for the truncated
  * short-doc shingle). Span-rewrite consumers
  * ([[graft.operators.TextAnalysis.stripRepeatedSpans]]) need the
  * positions to map an inventory hit back onto token indices; the
  * narrow default stays byte-identical for every existing consumer.
  */
case class WordShingles(child: Expression, k: Int, withPos: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${other.catalogString}")
  }

  override def elementSchema: StructType =
    if (withPos)
      new StructType()
        .add("__sh", StringType, nullable = false)
        .add("__pos", IntegerType, nullable = false)
        .add("__len", IntegerType, nullable = false)
    else new StructType().add("__sh", StringType, nullable = false)

  private val splitPattern = UTF8String.fromString("\\s+")
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val words = t.asInstanceOf[UTF8String].trim().toLowerCase().split(splitPattern, -1)
    val n = words.length
    val last = math.max(n - k + 1, 1)
    val out = new Array[InternalRow](last)
    var i = 0
    while (i < last) {
      val m = math.min(k, n - i)
      val sl = new Array[UTF8String](m)
      System.arraycopy(words, i, sl, 0, m)
      val sh = UTF8String.concatWs(space, sl: _*)
      out(i) = if (withPos) InternalRow(sh, i + 1, m) else InternalRow(sh)
      i += 1
    }
    out
  }

  override def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Column-API entry point: one row per word k-shingle of `text`. */
  def wordShingles(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))

  /** Positional variant: one row per shingle with its 1-based start
    * token index and actual word count — (__sh, __pos, __len).
    */
  def wordShinglesWithPos(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k, withPos = true))
}
