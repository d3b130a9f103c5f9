package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the round-8 operator family — generated
  * data, not fixtures (the etl/PropertySpec doctrine).
  */
class OperatorPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAllSampled[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private val keysGen = Gen.listOfN(80,
    Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty))

  test("scaled-long matvec sum equals the exact-decimal sum on arbitrary grid inputs") {
    // v on the 1e-4 grid within the ±8e5 fast-path bound, x on the 1e-9
    // grid within the normalized-iterate range (±1.1) — the round-10 Lsa
    // arithmetic doctrine's whole admissible domain, randomly sampled
    val rowGen = Gen.zip(
      Gen.choose(0, 4), // group
      Gen.choose(-8000000000L, 8000000000L).map(_ / 10000.0 / 1000), // |v| ≤ 8e5-ish
      Gen.choose(-1100000000L, 1100000000L).map(_ / 1e9))
    forAllSampled(Gen.listOfN(60, rowGen)) { rows =>
      val df = rows.toDF("g", "v", "x")
      val dec = df.groupBy(col("g")).agg(
        round(sum(col("v").cast("decimal(18,4)") * col("x").cast("decimal(10,9)")), 9)
          .cast("double").as("s"))
      val lng = df.groupBy(col("g")).agg(
        round(sum((
            (col("v").cast("decimal(18,4)") * lit(10000L).cast("decimal(5,0)")).cast("long")
              * round(col("x") * lit(1e9)).cast("long")
          ).cast("decimal(38,0)")).cast("decimal(25,0)")
            / lit(10000000000000L).cast("decimal(14,0)"), 9)
          .cast("double").as("s"))
      val a = dec.orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
      val b = lng.orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
      assert(a === b)
    }
  }

  test("bloom: zero false negatives on arbitrary key sets, any shape") {
    forAllSampled(Gen.zip(keysGen, Gen.oneOf(2, 3, 5), Gen.oneOf(512, 4096))) {
      case (keys, k, m) =>
        val df = keys.toDF("k")
        val bits = Bloom.build(df, "k", k, m)
        val fn = Bloom.probe(bits, df, "k", k, m).where(!col("member")).count()
        assert(fn === 0L, s"false negative at k=$k m=$m")
    }
  }

  test("fuzzy join t=1 equals the brute-force pair scan on random short strings") {
    val strGen = Gen.listOfN(25, Gen.listOfN(4, Gen.oneOf('a', 'b')).map(_.mkString))
    forAllSampled(strGen) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val got = FuzzyJoin.editDistance1Join(df, "s", "id")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val arr = strs.zipWithIndex
      val want = (for {
        (a, i) <- arr; (b, j) <- arr if i < j
        if levenshteinRef(a, b) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got === want)
    }
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("entity resolution partitions the input: every id appears exactly once, entity is a member") {
    val strGen = Gen.listOfN(30, Gen.listOfN(3, Gen.oneOf('x', 'y', 'z')).map(_.mkString))
    forAllSampled(strGen) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s, 1.0) }
        .toDF("id", "s", "sc")
      val res = EntityResolution.resolve(df, "s", "id", "sc", t = 1).collect()
      assert(res.map(_.getLong(0)).sorted.toSeq === (0L until strs.size).toSeq)
      val byEntity = res.groupBy(_.getLong(2))
      byEntity.foreach { case (e, members) =>
        assert(members.map(_.getLong(0)).contains(e), s"entity label $e not a member")
        assert(members.count(_.getLong(3) == 1L) === 1, s"entity $e canonical count")
        assert(members.map(_.getLong(0)).min === e, s"entity $e is not the min id")
      }
    }
  }

  test("per-group KMV never exceeds truth's hash count and is exact below k") {
    val gen = Gen.listOfN(100, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1, 40)))
    forAllSampled(gen) { rows =>
      val df = rows.toDF("grp", "key")
      val truth = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).distinct.size }
      Sketch.kmvPerGroup(df, "grp", "key", k = 64).collect().foreach { r =>
        val (g, kSeen, est) = (r.getString(0), r.getLong(1), r.getDouble(3))
        assert(kSeen === truth(g).toLong, s"below-k group $g must see exactly its distincts")
        assert(est === truth(g).toDouble, s"below-k estimate must be exact for $g")
      }
    }
  }
}
