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

  test("keySkewReport: hand-computed shares and Gini, null key is its own key") {
    // counts: a=4, b=2, null=2 → asc order (b,2),(null,2)?? ordering of
    // null in the rank window: Spark sorts NULLS FIRST ascending — pin
    // the fixture so null's count is unique and order is forced by n
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)(null))
      .map(Tuple1(_)).toSeq.toDF("k")
    val out = Skew.keySkewReport(df, "k", topK = 2).collect()
    // asc ranks by (n, key): (b,2)→1, (null,3)→2, (a,4)→3
    // S1 = 1·2 + 2·3 + 3·4 = 20; G = 2·20/(3·9) − 4/3 = 40/27 − 36/27 = 4/27
    val gini = BigDecimal(4.0 / 27.0).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length === 2)
    val r1 = out(0)
    assert(r1.getLong(0) === 1L && r1.getString(1) === "a" && r1.getLong(2) === 4L)
    assert(r1.getDouble(3) === BigDecimal(4.0 / 9.0).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r1.getLong(4) === 3L && r1.getLong(5) === 9L && r1.getDouble(6) === gini)
    assert(out(1).getString(1) === null, "the null key ranks second by count")
  }

  test("keySkewReport: uniform keys score Gini 0; a single key scores 0") {
    val uniform = spark.range(0, 100).select((col("id") % 10).as("k"))
    val g = Skew.keySkewReport(uniform, "k", 3).head.getDouble(6)
    // m=10 equal counts: G = 2·(55·10)/(10·100) − 11/10 = 1.1 − 1.1 = 0
    assert(g === 0.0)
    val single = spark.range(0, 50).select(lit("hot").as("k"))
    val s = Skew.keySkewReport(single, "k", 3).head
    assert(s.getDouble(6) === 0.0 && s.getDouble(3) === 1.0)
  }

  test("keySkewReport plan: no partition-less window over the key table") {
    val df = spark.range(0, 10000).select((col("id") % pow(col("id"), 0.5).cast("long")).as("k"))
    val plan = Skew.keySkewReport(df, "k", 5).queryExecution.executedPlan.toString
    // exactly two windows may survive: (1) the topK head — ordered by
    // (n desc, key) but WindowGroupLimit-pruned to topK rows per
    // partition before the single-partition window sees them; (2) the
    // Gini cumsum — ordered by the count value alone over the
    // distinct-frequency table (≤ √(2·n_rows) rows by construction).
    // No window may order by the key column without the group limit.
    // the topK head must be pruned before its global window: either
    // Catalyst's limit pushdown rewrites it to TakeOrderedAndProject
    // (≤ topK rows reach the window) or WindowGroupLimit caps each
    // partition at topK — both bound the key-table window's input
    val pruned = "WindowGroupLimit".r.findAllIn(plan).size +
      "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(pruned >= 1, s"topK head must be limit-pruned:\n$plan")
    val windowSpecs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toList
    val (overKey, overFreq) = windowSpecs.partition(_.contains("key#"))
    // the ONLY window allowed to sort by the key column is the pruned
    // topK head's; everything else must sort by the count value alone —
    // i.e. run over the distinct-frequency table, never the key table
    assert(overKey.size <= pruned,
      s"window over the key table without limit pruning:\n$plan")
    assert(overFreq.nonEmpty, s"frequency cumsum window missing:\n$plan")
  }

  test("keySkewReport: closed-form rank-sum equals per-key ranking on heavy ties") {
    // many keys sharing counts — exercises the rank-block closed form
    val df = spark.range(0, 5000).select((col("id") % 321).as("k"))
    val out = Skew.keySkewReport(df, "k", 4).collect()
    // driver-side reference: flat per-key ascending rank
    val counts = (0L until 5000L).map(_ % 321).groupBy(identity)
      .map { case (k, v) => (k.toString, v.size.toLong) }.toSeq
      .sortBy { case (k, n) => (n, k) }
    val m = counts.size.toLong
    val nRows = counts.map(_._2).sum
    val s1 = counts.zipWithIndex.map { case ((_, n), i) => (i + 1) * n }.sum
    val gini = BigDecimal(2.0 * s1 / (m.toDouble * nRows)
      - (m + 1).toDouble / m).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getLong(4) === m && out.head.getLong(5) === nRows)
    assert(out.head.getDouble(6) === gini)
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
