package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("estimates dominate true counts (the CMS guarantee) and are exact at collision-free width") {
    val exact = TextAnalysis.wordFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val queries = exact.keys.toSeq.toDF("token")
    // tight width: collisions expected, estimates must only overshoot
    val tight = Sketch.countMinSketch(docs, "text", depth = 4, width = 64)
    val estT = Sketch.cmsEstimate(tight, queries, "token", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, cnt) =>
      assert(estT(tok) >= cnt, s"'$tok': est ${estT(tok)} below true $cnt")
    }
    assert(exact.exists { case (tok, cnt) => estT(tok) > cnt },
      "width 64 over a real vocabulary must collide somewhere")
    // huge width: no collisions, estimates == exact for every token
    val wide = Sketch.countMinSketch(docs, "text", depth = 4, width = 1 << 20)
    val estW = Sketch.cmsEstimate(wide, queries, "token", depth = 4, width = 1 << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, cnt) =>
      assert(estW(tok) == cnt, s"'$tok': collision-free est ${estW(tok)} != $cnt")
    }
  }

  test("an absent token estimates as the smallest colliding cell, never negative") {
    val sk = Sketch.countMinSketch(docs, "text", depth = 4, width = 128)
    val est = Sketch.cmsEstimate(sk, Seq("qqqzzznotaword").toDF("token"),
        "token", depth = 4, width = 128)
      .head.getLong(1)
    assert(est >= 0L)
  }

  test("the sketch is bounded by depth x width cells and conserves total mass per row") {
    val sk = Sketch.countMinSketch(docs, "text", depth = 4, width = 64).collect()
    assert(sk.length <= 4 * 64)
    val totalTokens = TextAnalysis.wordFrequencies(docs, "text")
      .agg(sum(col("freq"))).head.getLong(0)
    (0 until 4).foreach { r =>
      val mass = sk.filter(_.getAs[Long]("depth") == r.toLong).map(_.getAs[Long]("cnt")).sum
      assert(mass == totalTokens, s"row $r mass $mass != $totalTokens")
    }
  }

  test("build is invariant to input partitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.countMinSketch(d, "text").collect()
        .map(_.toSeq).sortBy(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long])).toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("kmvPerGroup: below-k groups report their exact distinct count") {
    import spark.implicits._
    // group a: 10 distinct keys (< k=64) -> k_seen == est == 10 exactly;
    // group b: 3 distinct keys despite 30 rows (distinct first)
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 30).map(i => ("b", i % 3)))
      .toDF("grp", "key")
    val got = Sketch.kmvPerGroup(df, "grp", "key", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got("a") === ((10L, 10.0)))
    assert(got("b") === ((3L, 3.0)))
  }

  test("kmvPerGroup: above-k estimate lands within the ~1/sqrt(k) band") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", i)).toDF("grp", "key")
    val est = Sketch.kmvPerGroup(df, "grp", "key", k = 64).head.getDouble(3)
    // sd ≈ nd/sqrt(k) = 625; 4 sd is a one-in-sixteen-thousand flake
    assert(math.abs(est - 5000.0) < 2500.0, s"estimate $est too far from 5000")
  }

  test("kmvPerGroup: the rank filter plans as a partial WindowGroupLimit before the exchange") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"g${i % 4}", i)).toDF("grp", "key")
    val plan = Sketch.kmvPerGroup(df, "grp", "key", k = 64)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit pair, plan:\n$plan")
  }

  test("kmvPerGroup is invariant to input partitioning") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 3}", i * 7)).toDF("grp", "key")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.kmvPerGroup(d, "grp", "key", k = 32).collect()
        .map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(run(df) == run(df.repartition(11)))
  }
}
