package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("editDistance1Join finds substitution, insertion and deletion pairs, nothing else") {
    val d = Seq(
      (1L, "spark"), // vs 2: substitution (spark/spork), vs 3: deletion (spark/spar)
      (2L, "spork"),
      (3L, "spar"),
      (4L, "sparkle"),     // distance 2 from spark — must NOT appear
      (5L, "flink"),       // unrelated
      (6L, "spark")        // exact duplicate of 1 — distance 0
    ).toDF("id", "name")
    val out = FuzzyJoin.editDistance1Join(d, "name", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out((1L, 2L)) === 1L)
    assert(out((1L, 3L)) === 1L)
    assert(!out.contains((2L, 3L)), "spork/spar is distance 2 and must be absent")
    assert(out((1L, 6L)) === 0L, "exact duplicates surface with distance 0")
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L },
      "distance-2 neighbors must be filtered out")
    assert(!out.keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("editDistance1Join is EXACT for threshold 1: equals the brute-force pair scan") {
    val names = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .where(col("c_custkey") < 400)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val blocked = FuzzyJoin.editDistance1Join(names, "name", "id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute,
      s"blocking must lose no true pair and admit no false one: " +
        s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must actually contain distance-1 pairs")
  }

  test("editDistanceKJoin t=2 finds the two-edit pairs distance-1 blocking misses") {
    val d = Seq(
      (1L, "spark"),
      (2L, "sparkle"),  // two insertions from spark
      (3L, "stork"),    // two substitutions from spark
      (4L, "spa"),      // two deletions from spark
      (5L, "sparkles"), // distance 3 from spark — must NOT appear
      (6L, "")          // empty string: distance <= 2 only from spa? no — lev("", "spa") = 3
    ).toDF("id", "name")
    val out = FuzzyJoin.editDistanceKJoin(d, "name", "id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out((1L, 2L)) === 2L)
    assert(out((1L, 3L)) === 2L)
    assert(out((1L, 4L)) === 2L)
    assert(out((2L, 5L)) === 1L, "sparkle/sparkles is a true distance-1 pair")
    assert(!out.contains((1L, 5L)), "spark/sparkles is distance 3 and must be absent")
    assert(!out.keys.exists { case (a, b) => a == 6L || b == 6L },
      "the empty string is > 2 edits from every fixture name")
  }

  test("editDistanceKJoin t=2 is EXACT: equals the brute-force pair scan") {
    val names = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .where(col("c_custkey") < 200)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val blocked = FuzzyJoin.editDistanceKJoin(names, "name", "id", 2)
      .select("id_a", "id_b", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(blocked === brute,
      s"t=2 blocking must lose no true pair and admit no false one: " +
        s"missing=${(brute.keySet -- blocked.keySet).take(5)} " +
        s"extra=${(blocked.keySet -- brute.keySet).take(5)}")
    assert(brute.values.exists(_ == 2L), "fixture must actually contain distance-2 pairs")
  }

  test("editDistance1Join plans as equi-joins: no cartesian, no nested loop") {
    val names = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val plan = FuzzyJoin.editDistance1Join(names, "name", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"n² pair scan in the plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in the plan:\n$plan")
  }
}
