package graft.operators

import graft.SparkTestBase

class GraphStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    GraphStats.triangleStats(edges.toDF("a", "b"), "a", "b").head

  test("a triangle is one triangle, three wedges, clustering 1") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(r.getAs[Long]("n_vertices") === 3L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Double]("global_clustering") === 1.0)
  }

  test("a star has wedges but no triangles; clustering 0") {
    val r = stats(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(r.getAs[Long]("n_wedges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Double]("global_clustering") === 0.0)
  }

  test("K4: 4 triangles, 12 wedges, clustering 1") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = stats(k4)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Long]("n_wedges") === 12L)
    assert(r.getAs[Double]("global_clustering") === 1.0)
  }

  test("duplicate, reversed, and self edges collapse; result is partition-invariant") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    val a = stats(messy).toSeq
    val b = GraphStats.triangleStats(
      messy.toDF("a", "b").repartition(7), "a", "b").head.toSeq
    assert(a === b)
    assert(a(3) === 1L) // still exactly one triangle
  }

  test("an empty pair table reports all-zero stats, never an NPE") {
    val r = stats(Seq.empty)
    assert(r.toSeq === Seq(0L, 0L, 0L, 0L, 0.0))
  }

  test("bowtie: two triangles sharing a vertex — the shared hub closes nothing extra") {
    val r = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L)))
    assert(r.getAs[Long]("n_triangles") === 2L)
    // wedges: deg(3)=4 -> 6, four deg-2 vertices -> 1 each = 10
    assert(r.getAs[Long]("n_wedges") === 10L)
    assert(r.getAs[Double]("global_clustering") === 0.6)
  }
}
