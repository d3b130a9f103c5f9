package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator: bounded-depth word-suffix rows of a text
  * column — the row set of a RELATIONAL suffix array (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", §4: exact
  * substring dedup via a corpus suffix array; here the array is a row
  * set sorted by the engine, not an in-memory index).
  *
  * One output row per token position `pos` in `1 .. n - minLen + 1`:
  * `(__sfx, __pos)` where `__sfx` is the next `min(depth, n - pos + 1)`
  * tokens as an array. Positions within `minLen - 1` of the document end
  * are NOT emitted — a suffix shorter than `minLen` cannot start a match
  * of length ≥ `minLen`, so the row set is exactly the candidate match
  * starts. Documents shorter than `minLen` tokens generate nothing; null
  * text generates nothing.
  *
  * Tokenization is byte-identical to [[WordShingles]] (same
  * trim → lowercase → `\s+` split `UTF8String` calls), so suffix rows,
  * shingle rows, and the DuckDB oracles can never drift.
  *
  * Why a generator (not explode-beside-the-array): same structural tax
  * as WordShingles — the Generate operator would serialize the whole
  * token array into every exploded row (O(words²) bytes per document);
  * this emits each bounded slice exactly once, O(words × depth) total,
  * which is the honest cost of a bounded-depth suffix array (`depth` is
  * the truncation knob: shared spans longer than `depth` are reported as
  * exactly `depth` — caught as single units, length saturated).
  */
case class WordSuffixes(child: Expression, minLen: Int, depth: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(depth >= minLen, s"depth ($depth) must be >= minLen ($minLen)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_suffixes requires a string input, got ${other.catalogString}")
  }

  override def elementSchema: StructType =
    new StructType()
      .add("__sfx", ArrayType(StringType, containsNull = false), nullable = false)
      .add("__pos", IntegerType, nullable = false)

  private val splitPattern = UTF8String.fromString("\\s+")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val words = t.asInstanceOf[UTF8String].trim().toLowerCase().split(splitPattern, -1)
    val n = words.length
    val last = n - minLen + 1
    if (last < 1) return Nil
    val out = new Array[InternalRow](last)
    var i = 0
    while (i < last) {
      val m = math.min(depth, n - i)
      val sl = new Array[AnyRef](m)
      System.arraycopy(words, i, sl, 0, m)
      out(i) = InternalRow(new GenericArrayData(sl), i + 1)
      i += 1
    }
    out
  }

  override def withNewChildInternal(newChild: Expression): WordSuffixes =
    copy(child = newChild)

  override def prettyName: String = "word_suffixes"
}

object WordSuffixes {
  /** Column-API entry point: one row per candidate match-start position,
    * `(__sfx: array&lt;string&gt;, __pos: int)`.
    */
  def wordSuffixes(text: Column, minLen: Int, depth: Int): Column =
    ColumnBridge.column(WordSuffixes(ColumnBridge.expression(text), minLen, depth))
}
