package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  // two fuzzy clusters + singletons; scores pick the golden record
  private def corpus = Seq(
    (1L, "acme corp", 10.0),
    (2L, "acme c0rp", 90.0),   // dist 1 from "acme corp" -> cluster {1,2}
    (3L, "globex", 50.0),
    (4L, "globexx", 40.0),     // dist 1 -> cluster {3,4}
    (5L, "initech", 30.0)      // singleton
  ).toDF("id", "name", "score")

  test("resolve labels clusters by min id and elects by score desc, id asc") {
    val got = EntityResolution.resolve(corpus, "name", "id", "score", t = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((1L, 0L)))
    assert(got(2L) === ((1L, 1L))) // higher score wins the election
    assert(got(3L) === ((3L, 1L)))
    assert(got(4L) === ((3L, 0L)))
    assert(got(5L) === ((5L, 1L))) // singleton is its own canonical
  }

  private def assignments(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("id"), col("entity")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("incremental == full, including a bridge that merges two existing entities") {
    // existing gen: {10,11} ("alpha one"/"alpha 0ne"), {20} ("beta"),
    // {30} ("gamma ray")
    val existing = Seq(
      (10L, "alpha one"), (11L, "alpha 0ne"), (20L, "beta"), (30L, "gamma ray")
    ).toDF("id", "name")
    // increment: 40 bridges NOTHING (new singleton); 41 matches beta;
    // 42 is dist-1 from BOTH "alpha one" and "gamma ray"? impossible at
    // t=1 with these strings — instead 42/43 chain: 42 matches 11
    // ("alpha 0nee" is dist 1 from "alpha 0ne"), 43 matches 42 only
    val increment = Seq(
      (40L, "delta quad"), (41L, "betas"), (42L, "alpha 0nee"), (43L, "alpha 0neex")
    ).toDF("id", "name")
    val full = existing.unionByName(increment)

    val existingAssign = EntityResolution.resolve(
      existing.withColumn("s", lit(0.0)), "name", "id", "s", t = 1)
      .select(col("id"), col("entity"))
    val existingVariants = FuzzyJoin.deletionVariants(existing, "name", "id", 1)
    val inc = EntityResolution.resolveIncrement(
      existingAssign, existingVariants, increment, "name", "id", t = 1)
    val fullRes = EntityResolution.resolve(
      full.withColumn("s", lit(0.0)), "name", "id", "s", t = 1)
      .select(col("id"), col("entity"))
    assert(assignments(inc) === assignments(fullRes))
    // the chain 11-42-43 folds into entity 10; untouched 30 keeps itself
    val m = assignments(inc).toMap
    assert(m(42L) === 10L && m(43L) === 10L)
    assert(m(41L) === 20L)
    assert(m(40L) === 40L)
    assert(m(30L) === 30L)
  }

  test("an increment pair can merge two previously-separate existing entities") {
    // "abcd" and "abXYd" are dist 2 apart (separate at t=1); increment
    // "abXd" is dist 1 from BOTH -> all three must merge
    val existing = Seq((1L, "abcd"), (2L, "abXYd")).toDF("id", "name")
    val increment = Seq((9L, "abXd")).toDF("id", "name")
    val existingAssign = EntityResolution.resolve(
      existing.withColumn("s", lit(0.0)), "name", "id", "s", t = 1)
      .select(col("id"), col("entity"))
    assert(assignments(existingAssign) === Seq((1L, 1L), (2L, 2L)))
    val inc = EntityResolution.resolveIncrement(
      existingAssign, FuzzyJoin.deletionVariants(existing, "name", "id", 1),
      increment, "name", "id", t = 1)
    assert(assignments(inc) === Seq((1L, 1L), (2L, 1L), (9L, 1L)))
  }

  test("empty increment returns the existing assignment unchanged") {
    val existing = Seq((1L, "aa"), (2L, "ab")).toDF("id", "name")
    val existingAssign = EntityResolution.resolve(
      existing.withColumn("s", lit(0.0)), "name", "id", "s", t = 1)
      .select(col("id"), col("entity"))
    val inc = EntityResolution.resolveIncrement(
      existingAssign, FuzzyJoin.deletionVariants(existing, "name", "id", 1),
      Seq.empty[(Long, String)].toDF("id", "name"), "name", "id", t = 1)
    assert(assignments(inc) === assignments(existingAssign))
  }
}
