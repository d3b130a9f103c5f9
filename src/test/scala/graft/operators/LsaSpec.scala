package graft.operators

import graft.SparkTestBase

class LsaSpec extends SparkTestBase {
  import spark.implicits._

  test("a diagonal matrix's dominant column wins with loading 1") {
    // diag(10, 3, 1): AᵀA has eigenvalues 100, 9, 1 — two iterations
    // push essentially all mass onto column 'a'
    val m = Seq((1L, "a", 10.0), (2L, "b", 3.0), (3L, "c", 1.0))
      .toDF("r", "c", "v")
    val top = Lsa.topTermVector(m, "r", "c", "v", iterations = 3, k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(top.head._1 === "a")
    assert(top.head._2 > 0.999, s"dominant loading ${top.head._2}")
    assert(top(1)._1 === "b" && top(1)._2 < 0.03)
  }

  test("a rank-1 matrix recovers its exact column direction") {
    // A = u·vᵀ with v ∝ (3, 4): the right-singular direction is (0.6, 0.8)
    val m = (for (r <- 1L to 5L; (c, x) <- Seq(("p", 3.0), ("q", 4.0)))
      yield (r, c, r * x)).toDF("r", "c", "v")
    val top = Lsa.topTermVector(m, "r", "c", "v", iterations = 2, k = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(top("p") - 0.6) < 1e-6, s"p -> ${top("p")}")
    assert(math.abs(top("q") - 0.8) < 1e-6, s"q -> ${top("q")}")
  }

  test("deterministic across repartitioning; k bounds the output") {
    val m = (1L to 300L).map(i => (i % 30, s"t${i % 17}", (i % 7) + 1.0))
      .toDF("r", "c", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Lsa.topTermVector(d, "r", "c", "v", iterations = 2, k = 5)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val a = run(m)
    assert(a.size === 5)
    assert(a === run(m.repartition(7)))
  }
}
