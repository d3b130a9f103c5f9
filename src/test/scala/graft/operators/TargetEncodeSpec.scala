package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TargetEncodeSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed leave-fold-out smoothing on a 2-fold fixture") {
    // force the fold function aside: compute expected from the operator's
    // own fold assignment, but verify the ARITHMETIC by hand
    val df = (1L to 40L).map(i => (i, "c", i.toDouble)).toDF("id", "cat", "y")
    val out = TargetEncode.outOfFold(df, "cat", "y", "id", folds = 2, smoothing = 10.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // recompute expectations driver-side from the same md5 definition
    def foldOf(i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val hex = d.take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val prior = (1L to 40L).map(_.toDouble).sum / 40.0
    val sums = (0L to 1L).map(f =>
      f -> (1L to 40L).filter(foldOf(_) == f).map(_.toDouble).sum).toMap
    val cnts = (0L to 1L).map(f =>
      f -> (1L to 40L).count(foldOf(_) == f).toLong).toMap
    val total = sums.values.sum
    (1L to 40L).foreach { i =>
      val f = foldOf(i)
      val expected = BigDecimal((total - sums(f) + prior * 10.0)
          / ((40L - cnts(f)).toDouble + 10.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(i)._1 === f, s"fold of $i")
      assert(math.abs(out(i)._2 - expected) < 1e-9, s"encoding of $i")
    }
  }

  test("no leakage: a row's own fold never contributes to its encoding") {
    // one category, two folds; rows in fold f all share target value
    // 100·f. If a row saw its own fold, its encoding would move toward
    // its own value; leave-fold-out means fold-0 rows encode from ONLY
    // fold-1 values and vice versa.
    val df = (1L to 200L).map(i => (i, "c", 0.0)).toDF("id", "cat", "y")
    val folded = TargetEncode.outOfFold(df, "cat", "y", "id", folds = 2, smoothing = 1e-9)
      .select(col("fold")).distinct().collect().map(_.getLong(0)).toSet
    assert(folded === Set(0L, 1L))
    // distinctive targets: fold value encodes the fold
    val df2 = df.withColumn("y",
      TargetEncode.fold(col("id"), 2).cast("double") * 100.0)
    val out = TargetEncode.outOfFold(df2, "cat", "y", "id", folds = 2, smoothing = 1e-9)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // fold-0 rows see only fold-1 rows (target 100) and vice versa
    assert(math.abs(out(0L) - 100.0) < 1e-6, s"fold0 -> ${out(0L)}")
    assert(math.abs(out(1L) - 0.0) < 1e-6, s"fold1 -> ${out(1L)}")
  }

  test("rare categories shrink toward the global prior") {
    val common = (1L to 100L).map(i => (i, "big", 10.0))
    val rare = Seq((101L, "rare", 1000.0), (102L, "rare", 1000.0))
    val out = TargetEncode.outOfFold((common ++ rare).toDF("id", "cat", "y"),
        "cat", "y", "id", folds = 2, smoothing = 50.0)
      .where(col("cat") === "rare").collect().map(_.getDouble(3))
    val prior = (100 * 10.0 + 2 * 1000.0) / 102
    // with <=1 out-of-fold rare row against m=50, the encoding stays
    // within a few units of the prior, far from the rare mean of 1000
    out.foreach(e => assert(math.abs(e - prior) < 30.0, s"rare encoded $e vs prior $prior"))
  }

  test("the row table never shuffles: only broadcast joins below the projection") {
    val df = (1L to 500L).map(i => (i, s"c${i % 7}", i * 1.5)).toDF("id", "cat", "y")
    val plan = TargetEncode.outOfFold(df, "cat", "y", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "row-side join regressed to sort-merge")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, s"expected broadcast joins:\n$plan")
  }
}
