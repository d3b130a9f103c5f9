package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting + global clustering coefficient over an undirected
  * pair graph — the cohesion gauge of a near-dup/match graph: a high
  * clustering coefficient says candidate pairs close into genuine
  * duplicate groups; a low one says the pair generator is chaining
  * unrelated documents (the q118 dedup-eval theme at the graph level).
  *
  * Scale shape — the degree-ordered orientation (the standard
  * distributed-triangle trick): every undirected edge orients from its
  * (degree, id)-smaller endpoint to the larger, so each triangle is
  * counted EXACTLY once and the wedge join's fan-out is bounded by
  * out-degrees, which the orientation caps at O(√m) amortized — join
  * volume O(m^{3/2}) worst case instead of Σ deg² on the raw graph
  * (hub-proof: a star graph generates ZERO oriented wedges from its
  * hub). Two equi-joins + map-side-combinable aggregations; nothing
  * driver-side.
  *
  * Returns one row: (n_vertices, n_edges, n_wedges, n_triangles,
  * global_clustering) where global_clustering = 3·triangles / wedges
  * (0 when wedge-free) and wedges = Σ deg·(deg−1)/2 over the
  * UNDIRECTED degrees.
  */
object GraphStats {

  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = base.unionByName(base.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("v")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // orient by (deg, id): src is the smaller endpoint under that order
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .where(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("src"), col("b").as("dst"),
        col("db").as("ddst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at src: unordered out-neighbor pairs, closing edge oriented
    // (deg, id)-ascending between them — exactly how `oriented` stores it
    val e1 = oriented.select(col("src"), col("dst").as("v1"), col("ddst").as("d1"))
    val e2 = oriented.select(col("src"), col("dst").as("v2"), col("ddst").as("d2"))
    val openWedges = e1.join(e2, Seq("src"))
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
    val closing = oriented.select(col("src").as("v1"), col("dst").as("v2"))
    val nTriangles = openWedges.join(closing, Seq("v1", "v2"))
      .agg(count(lit(1)).as("n")).head.getLong(0)
    // coalesce: on an EMPTY graph the sums come back null (ansi off) and
    // a bare getLong would NPE — an empty pair table is a legal input
    val stats = deg.agg(
      count(lit(1)).as("n_vertices"),
      coalesce((sum(col("deg")) / 2).cast("long"), lit(0L)).as("n_edges"),
      coalesce(sum(col("deg") * (col("deg") - 1) / 2).cast("long"), lit(0L))
        .as("n_wedges")).head
    base.unpersist(); deg.unpersist(); oriented.unpersist()
    val spark = pairs.sparkSession
    import spark.implicits._
    Seq((stats.getLong(0), stats.getLong(1), stats.getLong(2), nTriangles,
      if (stats.getLong(2) == 0L) 0.0
      else BigDecimal(3.0 * nTriangles / stats.getLong(2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_vertices", "n_edges", "n_wedges", "n_triangles", "global_clustering")
  }

  /** k-core extraction by FIXED-ROUND peeling — the dense-cohesion
    * filter of graph curation (Seidman, Social Networks 1983): repeat
    * `rounds` times, drop every vertex whose degree in the surviving
    * subgraph is < k. The fixpoint of this peel is the k-core; a fixed
    * round count keeps the computation exactly replayable in unrolled
    * SQL (a data-dependent loop count could not be), and the emitted
    * `converged` flag — round R's survivor count equals round R−1's —
    * says whether the fixpoint was reached; callers re-run with more
    * rounds when it is 0. Each round is one semi-join of the edge list
    * against the survivor set + one degree aggregation: shuffle ∝
    * surviving edges, monotonically shrinking.
    *
    * Fully discrete (degrees, counts) — no rounding doctrine exists.
    * Returns survivors after `rounds` peels: (id, degree) in the
    * surviving subgraph, plus `converged` (same 0/1 on every row).
    */
  def kCorePeel(pairs: DataFrame, aCol: String, bCol: String,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val base = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .where(col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__a"),
        greatest(col("__a"), col("__b")).as("__b"))
      .distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var edges = base
    var deg: DataFrame = null
    var prevCount = -1L
    var lastCount = -1L
    var i = 0
    while (i < rounds) {
      val und = edges.select(col("__a").as("__v"))
        .unionAll(edges.select(col("__b").as("__v")))
      val d = und.groupBy(col("__v")).agg(count(lit(1)).as("degree"))
      val survivors = d.where(col("degree") >= k)
        .localCheckpoint(true)
      prevCount = lastCount
      lastCount = survivors.count()
      deg = survivors
      val sa = survivors.select(col("__v").as("__a"))
      val sb = survivors.select(col("__v").as("__b"))
      edges = edges.join(sa, Seq("__a"), "left_semi")
        .join(sb, Seq("__b"), "left_semi")
        .localCheckpoint(true)
      i += 1
    }
    // degrees restricted to the FINAL surviving subgraph (round R's edge
    // set), not the degrees that justified survival — re-derive once
    val finalDeg = edges.select(col("__a").as("__v"))
      .unionAll(edges.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("degree"))
    deg.select(col("__v").as("id"))
      .join(finalDeg.withColumnRenamed("__v", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"),
        lit(if (prevCount == lastCount) 1L else 0L).as("converged"))
  }
}
