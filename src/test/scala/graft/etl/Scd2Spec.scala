package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val snap1 = Seq(
    (1L, "GOLD", "NY"), (2L, "SILVER", "LA"), (3L, "GOLD", "SF"))
    .toDF("k", "tier", "city")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getDate(3)).map(_.toString).orNull,
      Option(r.getDate(4)).map(_.toString).orNull, r.getLong(5))).toSet

  test("initial load opens every row; merge handles all four categories") {
    val d1 = Scd2.initial(snap1, Seq("k"), Seq("tier", "city"), "2026-01-01")
    assert(rows(d1) === Set(
      (1L, "GOLD", "NY", "2026-01-01", null, 1L),
      (2L, "SILVER", "LA", "2026-01-01", null, 1L),
      (3L, "GOLD", "SF", "2026-01-01", null, 1L)))
    // snap2: 1 unchanged, 2 changes tier, 3 missing (closes), 4 new
    val snap2 = Seq((1L, "GOLD", "NY"), (2L, "GOLD", "LA"), (4L, "SILVER", "TX"))
      .toDF("k", "tier", "city")
    val d2 = Scd2.merge(d1, snap2, Seq("k"), Seq("tier", "city"), "2026-02-01")
    assert(rows(d2) === Set(
      (1L, "GOLD", "NY", "2026-01-01", null, 1L),          // unchanged
      (2L, "SILVER", "LA", "2026-01-01", "2026-02-01", 0L), // closed old
      (2L, "GOLD", "LA", "2026-02-01", null, 1L),          // opened new version
      (3L, "GOLD", "SF", "2026-01-01", "2026-02-01", 0L),  // closed missing
      (4L, "SILVER", "TX", "2026-02-01", null, 1L)))       // new key
  }

  test("a third merge leaves closed history untouched and chains versions") {
    val d1 = Scd2.initial(snap1, Seq("k"), Seq("tier", "city"), "2026-01-01")
    val d2 = Scd2.merge(d1, Seq((2L, "GOLD", "LA")).toDF("k", "tier", "city"),
      Seq("k"), Seq("tier", "city"), "2026-02-01")
    val d3 = Scd2.merge(d2, Seq((2L, "PLAT", "LA")).toDF("k", "tier", "city"),
      Seq("k"), Seq("tier", "city"), "2026-03-01")
    val k2 = rows(d3).filter(_._1 == 2L)
    assert(k2 === Set(
      (2L, "SILVER", "LA", "2026-01-01", "2026-02-01", 0L),
      (2L, "GOLD", "LA", "2026-02-01", "2026-03-01", 0L),
      (2L, "PLAT", "LA", "2026-03-01", null, 1L)))
    // exactly one open row per live key, chain closes match chain opens
    val open = d3.where(col("is_current") === 1).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(open.values.forall(_ === 1L))
  }

  test("null transitions: NULL→NULL is unchanged, NULL→value is a change") {
    val a = Seq((1L, null.asInstanceOf[String], "NY"), (2L, null.asInstanceOf[String], "LA"))
      .toDF("k", "tier", "city")
    val d1 = Scd2.initial(a, Seq("k"), Seq("tier", "city"), "2026-01-01")
    val b = Seq((1L, null.asInstanceOf[String], "NY"), (2L, "GOLD", "LA"))
      .toDF("k", "tier", "city")
    val d2 = Scd2.merge(d1, b, Seq("k"), Seq("tier", "city"), "2026-02-01")
    val byK = d2.collect().groupBy(_.getLong(0))
    assert(byK(1L).length === 1 && byK(1L).head.getLong(5) === 1L, "NULL→NULL passes through")
    assert(byK(2L).length === 2, "NULL→GOLD closes and reopens")
  }

  test("closeMissing=false keeps absent keys open (partial-snapshot feeds)") {
    val d1 = Scd2.initial(snap1, Seq("k"), Seq("tier", "city"), "2026-01-01")
    val d2 = Scd2.merge(d1, Seq((1L, "GOLD", "NY")).toDF("k", "tier", "city"),
      Seq("k"), Seq("tier", "city"), "2026-02-01", closeMissing = false)
    assert(d2.where(col("is_current") === 1).count() === 3)
    assert(rows(d2) === rows(d1))
  }
}
