package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("interval-bucket join equals the naive inequality join") {
    val left = (1L to 50L).map(i => (i, i % 3, ts(i * 137))).toDF("lid", "k", "ts")
    val right = (1L to 80L).map(i => (100 + i, i % 3, ts(i * 89))).toDF("rid", "k", "rts")
      .select(col("k"), col("rts"), col("rid"))
    val w = 300L
    val bucketed = RangeJoin.timeWindowInner(left, right, "k", "ts", "rts", w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("k"))
      .where(col("rts").cast("double") <= col("ts").cast("double") &&
        col("rts").cast("double") >= col("ts").cast("double") - w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("inclusive bounds: exact boundary timestamps match, just-outside do not") {
    val left = Seq((1L, 1L, ts(1000))).toDF("lid", "k", "ts")
    val right = Seq(
      (10, 1L, ts(1000)),      // equal → in
      (11, 1L, ts(700)),       // lower bound (1000-300) → in
      (12, 1L, ts(699)),       // just below → out
      (13, 1L, ts(1001))       // future → out
    ).toDF("rid", "k", "rts").select(col("k"), col("rts"), col("rid"))
    val got = RangeJoin.timeWindowInner(left, right, "k", "ts", "rts", 300)
      .select("rid").collect().map(_.getInt(0)).toSet
    assert(got === Set(10, 11))
  }
}
