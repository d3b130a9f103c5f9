package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 item 4): dedup+key, lookup joins,
  * fill idempotence — on generated data, not fixtures.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** scalatestplus isn't available offline; sample generators directly with
    * fixed seeds for reproducible property runs.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private val rowsGen = Gen.listOfN(60, Gen.zip(Gen.choose(1, 8), Gen.choose(1, 5)))

  test("surrogate keys are dense 1..n over the distinct set, invariant to input duplication") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("a", "b")
      val dedup = df.dropDuplicates()
      val keyed = SurrogateKeys.withWindowId(dedup, "id", Seq(col("a"), col("b")))
      val n = dedup.count()
      val ids = keyed.select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === (1L to n).toSeq)
      // doubling the input changes nothing
      val keyed2 = SurrogateKeys.withWindowId(df.union(df).dropDuplicates(), "id", Seq(col("a"), col("b")))
      assert(keyed2.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet ===
        keyed.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet)
    }
  }

  test("left lookup join with unique right keys preserves left row count") {
    forAllSampled(rowsGen) { rows =>
      val left = rows.toDF("k", "v")
      val right = left.select(col("k")).distinct()
        .withColumn("rk", col("k") * 10)
      val joined = left.join(right, Seq("k"), "left")
      assert(joined.count() === left.count())
    }
  }

  test("na.fill is idempotent") {
    forAllSampled(Gen.listOfN(30, Gen.option(Gen.choose(-100.0, 100.0)))) { vals =>
      val df = vals.toDF("x")
      val once = df.na.fill(0.0)
      val twice = once.na.fill(0.0)
      assert(once.collect().map(_.getDouble(0)).sorted.toSeq ===
        twice.collect().map(_.getDouble(0)).sorted.toSeq)
      assert(once.where(col("x").isNull).count() === 0)
    }
  }

  test("upperTrim never yields null and uppercases") {
    forAllSampled(Gen.listOfN(30, Gen.option(Gen.alphaNumStr.map(s => s"  $s ")))) { vals =>
      val df = vals.toDF("s")
      val out = df.select(Cleaning.upperTrim(col("s")).as("c")).collect().map(_.getString(0))
      assert(out.forall(_ != null))
      assert(out.forall(s => s == s.toUpperCase))
      assert(out.forall(s => s == s.trim))
    }
  }
}
