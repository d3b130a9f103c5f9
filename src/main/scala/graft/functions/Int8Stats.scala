package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: int8 scalar-quantization statistics of one
  * float/double vector in a single fused pass — the codegen upgrade of
  * [[graft.operators.Quantize]]'s higher-order-function formulation, whose
  * array lambdas Spark interprets per element.
  *
  * Returns `struct<n_dims:bigint, q_min:bigint, q_max:bigint, q_sum:bigint,
  * mse:double>`; null for a null or EMPTY input array. Every arithmetic
  * step replays the HOF version exactly, so results are bitwise identical
  * (spec-asserted) and the existing q81 DuckDB oracle needs no change:
  *   - code  = round((x-mn)/(mx-mn)*255, 0) - 128 with Spark's
  *     Round(DoubleType) semantics — BigDecimal(Double.toString) HALF_UP —
  *     NOT Math.round (floor(x+0.5) differs on ulp-boundary ties);
  *   - deq   = mn + ((code+128) * (mx-mn)) / 255 in that association;
  *   - mse   = left-to-right sum of (x-deq)² in array order / n (unrounded
  *     here; callers round for presentation).
  * The per-element BigDecimal round is the price of bitwise HOF parity; it
  * still beats the HOF stack ~3× because the pass is fused (no transform/
  * zip_with intermediate arrays, no per-element lambda dispatch, struct
  * built once per row).
  */
case class Int8Stats(child: Expression) extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_stats requires array<float>/array<double> input, got ${other.catalogString}")
    }

  override def dataType: DataType = Int8Stats.outputType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val isF = elemIsFloat
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    var qMin = Int.MaxValue
    var qMax = Int.MinValue
    var qSum = 0L
    var errSum = 0.0
    i = 0
    while (i < n) {
      val v = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = Int8Stats.code(v, mn, mx)
      if (q < qMin) qMin = q
      if (q > qMax) qMax = q
      qSum += q
      val d = mn + ((q + 128).toDouble * (mx - mn)) / 255.0
      errSum += (v - d) * (v - d)
      i += 1
    }
    InternalRow(n.toLong, qMin.toLong, qMax.toLong, qSum, errSum / n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cls = Int8Stats.getClass.getName.stripSuffix("$") // companion static fwd
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val qMin = ctx.freshName("qMin")
      val qMax = ctx.freshName("qMax")
      val qSum = ctx.freshName("qSum")
      val err = ctx.freshName("err")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $mn = Double.POSITIVE_INFINITY;
         |  double $mx = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $v = (double) $x.$get($i);
         |    if ($v < $mn) $mn = $v;
         |    if ($v > $mx) $mx = $v;
         |  }
         |  int $qMin = Integer.MAX_VALUE; int $qMax = Integer.MIN_VALUE;
         |  long $qSum = 0L; double $err = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $v = (double) $x.$get($i);
         |    final int $q = $cls.code($v, $mn, $mx);
         |    if ($q < $qMin) $qMin = $q;
         |    if ($q > $qMax) $qMax = $q;
         |    $qSum += $q;
         |    final double $d = $mn + (($q + 128) * ($mx - $mn)) / 255.0;
         |    $err += ($v - $d) * ($v - $d);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{(long) $n, (long) $qMin, (long) $qMax, $qSum, $err / $n});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Stats {
  val outputType: StructType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  /** One int8 code — Spark Round(HALF_UP over BigDecimal(Double.toString))
    * semantics, shared by the interpreted and generated paths (called as a
    * static from codegen).
    */
  def code(v: Double, mn: Double, mx: Double): Int =
    if (mx == mn) 0
    else {
      val scaled = (v - mn) / (mx - mn) * 255.0
      new java.math.BigDecimal(java.lang.Double.toString(scaled))
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .intValue() - 128
    }

  /** Column-level entry point. */
  def int8Stats(v: Column): Column =
    ColumnBridge.column(Int8Stats(ColumnBridge.expression(v)))
}
