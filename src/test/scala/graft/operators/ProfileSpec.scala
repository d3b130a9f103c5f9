package graft.operators

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.0)),
    (4L, Some("a"), Some(10.5))
  ).toDF("id", "s", "v")

  test("profile: counts, nulls, distincts, typed min/max per column") {
    val out = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 0L, 4L, "1", "4")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    // numeric min/max computed on the DOUBLE, then stringified — not
    // lexicographic ("10.5" < "2.0" as strings)
    assert(out("v") === ((4L, 1L, 2L, "2.0", "10.5")))
  }

  test("profile: approx mode keeps schema and exact null counts") {
    val out = Profile.profile(df, Seq("s"), exact = false).collect().head
    assert(out.getString(0) === "s")
    assert(out.getLong(1) === 4L && out.getLong(2) === 1L)
    // HLL on 2 distincts is exact in practice
    assert(out.getLong(3) === 2L)
  }

  test("profile plans a single scan of the input") {
    val plan = Profile.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan, plan:\n$plan")
  }
}
