package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Proves the GENERATED path of Int8Stats compiles and agrees with the
  * interpreted path — Spark silently falls back to interpreted eval when
  * doGenCode output fails to compile, so a DataFrame-level spec alone
  * cannot distinguish the two.
  */
class Int8StatsSpec extends SparkTestBase {

  private def viaCodegen(values: Array[Double]): InternalRow = {
    val expr = Int8Stats(BoundReference(0, ArrayType(DoubleType), nullable = true))
    // UnsafeProjection.create compiles doGenCode directly — a codegen bug
    // throws here instead of silently falling back
    val proj = UnsafeProjection.create(Seq(expr))
    proj(InternalRow(ArrayData.toArrayData(values))).getStruct(0, 5).copy()
  }

  private def viaInterpreted(values: Array[Double]): InternalRow = {
    val expr = Int8Stats(BoundReference(0, ArrayType(DoubleType), nullable = true))
    expr.eval(InternalRow(ArrayData.toArrayData(values))).asInstanceOf[InternalRow]
  }

  test("generated and interpreted evals agree bitwise") {
    val cases = Seq(
      Array(0.0, 1.0, 2.0, 4.0),
      Array(3.5, 3.5, 3.5),
      Array(-1.25, 0.0, 7.75, -0.5, 3.125),
      Array(1e-9, -1e-9, 5e-10),
      Array(42.0))
    cases.foreach { vs =>
      val g = viaCodegen(vs)
      val i = viaInterpreted(vs)
      assert(g.getLong(0) === i.getLong(0), s"n_dims on ${vs.toSeq}")
      assert(g.getLong(1) === i.getLong(1), s"q_min on ${vs.toSeq}")
      assert(g.getLong(2) === i.getLong(2), s"q_max on ${vs.toSeq}")
      assert(g.getLong(3) === i.getLong(3), s"q_sum on ${vs.toSeq}")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(i.getDouble(4)), s"mse on ${vs.toSeq}")
    }
  }

  test("empty array yields null in both paths") {
    val expr = Int8Stats(BoundReference(0, ArrayType(DoubleType), nullable = true))
    assert(expr.eval(InternalRow(ArrayData.toArrayData(Array.empty[Double]))) === null)
    val proj = UnsafeProjection.create(Seq(expr))
    assert(proj(InternalRow(ArrayData.toArrayData(Array.empty[Double]))).isNullAt(0))
  }
}
