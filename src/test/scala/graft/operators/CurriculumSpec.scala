package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("curriculum phases partition the corpus into score-monotone quartiles") {
    val out = Curriculum.curriculumOrder(docs, "doc_id", "n_chars", nPhases = 4)
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .collect()
    assert(out.length === docs.where(col("n_chars").isNotNull).count())
    val byPhase = out.groupBy(_.getAs[Long]("phase"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("n_chars")) }
    assert(byPhase.keySet === Set(1L, 2L, 3L, 4L))
    // value-monotone: every score in phase p is <= every score in p+1
    (1L to 3L).foreach { p =>
      assert(byPhase(p).max <= byPhase(p + 1).min,
        s"phase $p max ${byPhase(p).max} > phase ${p + 1} min ${byPhase(p + 1).min}")
    }
    // quartile fences: phase sizes are roughly a quarter each
    byPhase.values.foreach(v => assert(v.length > out.length / 8))
    // shuffle key is the Sharding.shuffleKey md5 derivation, deterministic
    val again = Curriculum.curriculumOrder(docs.repartition(13), "doc_id", "n_chars", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phase"),
      r.getAs[Long]("shuffle_key"))).toSet === again)
  }

  test("curriculum plan: fences broadcast, no corpus-wide window") {
    val plan = Curriculum.curriculumOrder(docs, "doc_id", "n_chars", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "fences must broadcast")
    assert(!plan.contains("windowspecdefinition"),
      s"curriculum must not plan any window:\n$plan")
  }

  test("budgetSelect equals the flat single-window prefix sum exactly") {
    val out = Curriculum.budgetSelect(docs, "doc_id", "n_chars", "n_chars",
      budget = 50000L).collect()
    assert(out.nonEmpty)
    // reference: flat driver-side prefix sum in (score desc, id) order
    val all = docs.where(col("n_chars").isNotNull)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }
    var cum = 0L
    val expected = all.map { case (id, n) => cum += n; (id, n, cum) }
      .takeWhile(_._3 <= 50000L)
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cost"),
      r.getAs[Long]("running_total"))).sortBy(_._3).toSeq === expected.toSeq)
    // two-level sum: every window in the plan is partitioned over buckets,
    // except the nBuckets-row offset window (bounded input)
    val plan = Curriculum.budgetSelect(docs, "doc_id", "n_chars", "n_chars", 50000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__b"),
      s"bucket-partitioned cumulative window missing:\n$plan")
  }

  test("budgetSelect: budget larger than the corpus keeps everything; invariant to partitioning") {
    val total = docs.agg(sum("n_chars")).head.getLong(0)
    val all = Curriculum.budgetSelect(docs, "doc_id", "n_chars", "n_chars", total + 1)
    assert(all.count() === docs.where(col("n_chars").isNotNull).count())
    val a = Curriculum.budgetSelect(docs, "doc_id", "n_chars", "n_chars", 50000L)
      .collect().map(_.toString).sorted.toSeq
    val b = Curriculum.budgetSelect(docs.repartition(17), "doc_id", "n_chars", "n_chars", 50000L)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
