package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("matched rows take the update's full record, unmatched insert, rest pass through") {
    val updates = Seq((2L, "b2", 99.0), (9L, "new", 0.0)).toDF("k", "name", "bal")
    val got = Merge.upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (9L, "new", 0.0)))
  }

  test("update row owns its record: null non-key columns overwrite (MERGE UPDATE SET *)") {
    val updates = Seq((3L, null.asInstanceOf[String], 0.0)).toDF("k", "name", "bal")
    val got = Merge.upsert(base, updates, Seq("k"))
      .where(col("k") === 3L).select("name", "bal").as[(String, Double)].head()
    assert(got == ((null, 0.0)))
  }

  test("output columns and types are the base's (nullability may widen)") {
    val updates = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    val out = Merge.upsert(base, updates, Seq("k")).schema
    assert(out.fields.map(f => (f.name, f.dataType)).toSeq ==
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("mismatched update schema is rejected") {
    intercept[IllegalArgumentException] {
      Merge.upsert(base, Seq((1L, "x")).toDF("k", "name"), Seq("k"))
    }
  }

  test("null join key in updates inserts (ON b.k = u.k never matches null)") {
    val baseN = Seq((Option(1L), "a", 10.0), (Option.empty[Long], "nb", 20.0))
      .toDF("k", "name", "bal")
    val updates = Seq((Option.empty[Long], "nu", 30.0)).toDF("k", "name", "bal")
    val got = Merge.upsert(baseN, updates, Seq("k"))
      .select("name").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "nb", "nu"), "null-key rows must not match each other")
  }

  test("checkDuplicateKeys=true rejects a multi-row-per-key batch") {
    val updates = Seq((2L, "b2", 99.0), (2L, "b3", 50.0)).toDF("k", "name", "bal")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, updates, Seq("k"), checkDuplicateKeys = true)
    }
  }

  test("idempotent: merging the same batch twice equals merging it once") {
    val updates = Seq((2L, "b2", 99.0), (9L, "new", 0.0)).toDF("k", "name", "bal")
    val once = Merge.upsert(base, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }
}
