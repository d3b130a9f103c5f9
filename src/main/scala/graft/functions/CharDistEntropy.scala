package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: [a-z] character-distribution entropy of one
  * string in a single fused pass — the codegen upgrade of
  * [[graft.operators.TextAnalysis.charEntropyExploded]], which materializes
  * one exploded row PER LETTER of the corpus before aggregating. The
  * per-doc aggregation state there is bounded (≤26 rows/doc reach the
  * exchange), so the explode is not a shuffle problem — it is a per-row CPU
  * problem: corpus-character cardinality of regex match, row materialization
  * and hash-agg probes. This expression deletes all of it: one byte scan per
  * row, a 26-long count array on the stack, zero intermediate rows.
  *
  * Returns `struct<n_alpha:bigint, char_entropy:double>`; null for a null
  * input or a string with no [a-z] letters (matching the exploded form,
  * where such docs simply produce no group). The caller lowercases first
  * (Spark `lower`, Unicode-aware), so this expression only ever counts the
  * ASCII bytes 'a'..'z' — multibyte UTF-8 sequences have the high bit set
  * and cannot collide.
  *
  * Bitwise parity with the exploded form (spec-asserted): each c·ln(c) term
  * is quantized exactly as Spark's `Cast(double → DECIMAL(28,9))` does —
  * `BigDecimal(Double.toString(x)).setScale(9, HALF_UP)` — and the terms
  * accumulate as exact BigDecimals (≤26 of them, fixed alphabet order; a
  * decimal sum is order-free, so this equals the exploded form's
  * partition-order-independent decimal aggregate). The final
  * `sum.doubleValue` is the same decimal→double conversion the exploded
  * form's `cast("double")` performs; `ln(n) − clnc/n` then replays its
  * double arithmetic term for term.
  */
case class CharDistEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_dist_entropy requires string input, got ${other.catalogString}")
    }

  override def dataType: DataType = CharDistEntropy.outputType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharDistEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CharDistEntropy.getClass.getName.stripSuffix("$") // companion static fwd
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = $cls.compute($x);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharDistEntropy {
  val outputType: StructType = StructType(Seq(
    StructField("n_alpha", LongType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false)))

  /** One fused pass: byte scan → 26 counts → decimal-quantized entropy.
    * Shared by the interpreted and generated paths (called as a static from
    * codegen). Null for a letterless string.
    */
  def compute(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val counts = new Array[Long](26)
    var n = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') { counts(c - 'a') += 1L; n += 1L }
      i += 1
    }
    if (n == 0L) null
    else {
      var sum = java.math.BigDecimal.ZERO
      var j = 0
      while (j < 26) {
        val c = counts(j)
        if (c > 0L) {
          val t = c.toDouble * Math.log(c.toDouble)
          // exactly Spark's Cast(double -> DECIMAL(28,9)):
          // BigDecimal(Double.toString) then setScale(9, HALF_UP)
          sum = sum.add(new java.math.BigDecimal(java.lang.Double.toString(t))
            .setScale(9, java.math.RoundingMode.HALF_UP))
        }
        j += 1
      }
      val nd = n.toDouble
      InternalRow(n, Math.log(nd) - sum.doubleValue() / nd)
    }
  }

  /** Column-level entry point. */
  def charDistEntropy(s: Column): Column =
    ColumnBridge.column(CharDistEntropy(ColumnBridge.expression(s)))
}
