package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join (inner and left)") {
    // heavily skewed probe: 90% of rows share key 1
    val probe = spark.range(0, 2000).select(
      col("id").as("rid"),
      when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 7).as("k"))
    val build = Seq((0L, "z"), (1L, "a"), (2L, "b"), (5L, "e")).toDF("k", "v")

    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("rid", "k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toSet
      val salted = Skew.saltedJoin(probe, build, "k", "rid", factor = 8, joinType = jt)
        .select("rid", "k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toSet
      assert(salted === plain, s"join type $jt")
    }
  }

  test("salt is deterministic and spans the factor range") {
    val df = spark.range(0, 1000).select(Skew.salt(col("id"), 8).as("s"))
    val values = df.distinct().collect().map(_.getInt(0)).toSet
    assert(values === (0 until 8).toSet)
    val again = spark.range(0, 1000).select(Skew.salt(col("id"), 8).as("s"))
      .collect().map(_.getInt(0)).toSeq
    val first = df.collect().map(_.getInt(0)).toSeq
    assert(again === first)
  }
}
