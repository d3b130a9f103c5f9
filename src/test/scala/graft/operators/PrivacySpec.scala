package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // 3 classes: ("US", "A") x 5 rows, ("US", "B") x 2, ("FR", "A") x 3
  private def fixture = (
    (1 to 5).map(i => (i, "US", "A")) ++
    (6 to 7).map(i => (i, "US", "B")) ++
    (8 to 10).map(i => (i, "FR", "A"))
  ).toDF("id", "country", "segment")

  test("classes report size and verdict at k") {
    val got = Privacy.kAnonymityClasses(fixture, Seq("country", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("US", "A")) === ((5L, 1L)))
    assert(got(("US", "B")) === ((2L, 0L)))
    assert(got(("FR", "A")) === ((3L, 1L)))
  }

  test("suppression keeps exactly the rows of >= k classes; the survivor set is k-anonymous") {
    val out = Privacy.suppressBelowK(fixture, Seq("country", "segment"), k = 3)
    assert(out.count() === 10)
    val kept = out.where(col("__keep") === 1L)
    assert(kept.count() === 8)
    assert(kept.where(col("segment") === "B").count() === 0)
    // re-auditing the survivors finds no below-k class
    val reaudit = Privacy.kAnonymityClasses(kept.drop("__keep"),
      Seq("country", "segment"), k = 3)
    assert(reaudit.where(col("anonymous") === 0L).count() === 0)
  }

  test("a null quasi combination is its own class and gets judged (null-safe join)") {
    val withNulls = fixture.unionByName(
      Seq((11, null.asInstanceOf[String], "A"), (12, null.asInstanceOf[String], "A"))
        .toDF("id", "country", "segment"))
    val out = Privacy.suppressBelowK(withNulls, Seq("country", "segment"), k = 2)
    val nullRows = out.where(col("country").isNull).collect()
    assert(nullRows.length === 2)
    // the two (null, "A") rows form a size-2 class: kept at k=2, and
    // crucially NOT left with a null verdict by the join
    nullRows.foreach(r => assert(r.getAs[Long]("__keep") === 1L))
    val out3 = Privacy.suppressBelowK(withNulls, Seq("country", "segment"), k = 3)
    out3.where(col("country").isNull).collect()
      .foreach(r => assert(r.getAs[Long]("__keep") === 0L))
  }

  test("l-diversity flags the homogeneous class k-anonymity would pass") {
    // ("US","A") x 5 all share sensitive "x" — k-anonymous at k=3 but
    // NOT 2-diverse; ("FR","A") x 3 carries two sensitive values
    val df = (
      (1 to 5).map(i => (i, "US", "A", "x")) ++
      Seq((8, "FR", "A", "x"), (9, "FR", "A", "y"), (10, "FR", "A", "y"))
    ).toDF("id", "country", "segment", "sensitive")
    val kOk = Privacy.kAnonymityClasses(df, Seq("country", "segment"), k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(kOk("US") === 1L && kOk("FR") === 1L)
    val lv = Privacy.lDiversityClasses(df, Seq("country", "segment"), "sensitive", l = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(lv("US") === ((1L, 0L)), "homogeneous class must fail diversity")
    assert(lv("FR") === ((2L, 1L)))
  }

  test("single quasi column and k=1 degenerate cases") {
    val classes = Privacy.kAnonymityClasses(fixture, Seq("country"), k = 1)
    assert(classes.where(col("anonymous") === 0L).count() === 0)
    assert(classes.count() === 2)
  }
}
