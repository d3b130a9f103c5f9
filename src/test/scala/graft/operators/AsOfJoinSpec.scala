package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("asOfLeft picks the latest right row at-or-before each left timestamp") {
    val left = Seq((1L, 10L, ts(10)), (2L, 10L, ts(25)), (3L, 10L, ts(5)), (4L, 20L, ts(8)))
      .toDF("lid", "k", "ts")
    val right = Seq((100L, 10L, ts(7)), (200L, 10L, ts(10)), (300L, 10L, ts(20)))
      .toDF("rid", "k", "ts")
      .select(col("k"), col("ts"), col("rid"))
    val out = AsOfJoin.asOfLeft(left, right, "k", "ts", Seq("rid"))
      .select("lid", "rid").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) === 200L) // equal ts → inclusive match
    assert(out(2L) === 300L) // latest at-or-before 25 is 20
    assert(out(3L) === -1L)  // before any right row → null
    assert(out(4L) === -1L)  // key with no right rows → null
  }

  test("row count is preserved (pure left semantics, no fan-out)") {
    val left = Seq((1L, 1L, ts(1)), (2L, 1L, ts(2)), (3L, 1L, ts(3))).toDF("lid", "k", "ts")
    val right = Seq((9L, 1L, ts(1)), (8L, 1L, ts(1))).toDF("rid", "k", "ts")
      .select(col("k"), col("ts"), col("rid"))
    assert(AsOfJoin.asOfLeft(left, right, "k", "ts", Seq("rid")).count() === 3L)
  }
}
