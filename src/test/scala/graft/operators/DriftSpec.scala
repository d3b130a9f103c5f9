package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def df(xs: Seq[Double]) = xs.toDF("x")

  test("identical snapshots measure zero drift on both scales") {
    val a = df((1 to 500).map(i => (i % 37).toDouble))
    val r = Drift.numericDrift(a, a, "x").head
    assert(r.getAs[Long]("n_base") == 500L && r.getAs[Long]("n_cur") == 500L)
    assert(r.getAs[Double]("ks") == 0.0, "equal ECDFs")
    assert(r.getAs[Double]("psi") == 0.0, "equal bucket masses, ln(1) terms")
  }

  test("disjoint supports saturate KS at 1 and blow past the PSI alarm") {
    val a = df((1 to 300).map(_.toDouble))
    val b = df((1 to 300).map(i => 10000.0 + i))
    val r = Drift.numericDrift(a, b, "x").head
    assert(r.getAs[Double]("ks") == 1.0, "disjoint supports: max ECDF gap is 1")
    assert(r.getAs[Double]("psi") > 0.25, s"way past the 0.25 rule of thumb: ${r.getAs[Double]("psi")}")
  }

  test("a bigger shift measures bigger drift than a small one") {
    val base = df((1 to 1000).map(i => (i % 100).toDouble))
    val small = df((1 to 1000).map(i => (i % 100) + 5.0))
    val big = df((1 to 1000).map(i => (i % 100) + 60.0))
    val rs = Drift.numericDrift(base, small, "x").head
    val rb = Drift.numericDrift(base, big, "x").head
    assert(rb.getAs[Double]("psi") > rs.getAs[Double]("psi"))
    assert(rb.getAs[Double]("ks") > rs.getAs[Double]("ks"))
  }

  test("KS matches a driver-side two-sample reference on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = li.where(col("l_shipdate") < lit("1998-01-01"))
    val b = li.where(col("l_shipdate") >= lit("1998-01-01"))
    val r = Drift.numericDrift(a, b, "l_extendedprice").head
    def vals(d: org.apache.spark.sql.DataFrame) = d
      .select(round(col("l_extendedprice").cast("double"), 6))
      .collect().map(_.getDouble(0)).sorted
    val va = vals(a); val vb = vals(b)
    val grid = (va ++ vb).distinct.sorted
    def ecdf(v: Array[Double], x: Double) = {
      var lo = 0; var hi = v.length
      while (lo < hi) { val m = (lo + hi) / 2; if (v(m) <= x) lo = m + 1 else hi = m }
      lo.toDouble / v.length
    }
    val ks = grid.map(x => math.abs(ecdf(va, x) - ecdf(vb, x))).max
    assert(math.abs(r.getAs[Double]("ks") - ks) < 1e-9,
      s"engine ${r.getAs[Double]("ks")} vs reference $ks")
  }

  test("null values are excluded from both counts") {
    val a = Seq(Some(1.0), Some(2.0), None).toDF("x")
    val b = Seq(Some(1.5), None, None).toDF("x")
    val r = Drift.numericDrift(a, b, "x").head
    assert(r.getAs[Long]("n_base") == 2L && r.getAs[Long]("n_cur") == 1L)
  }

  test("invariant to input partitioning") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = li.where(col("l_shipdate") < lit("1998-01-01"))
    val b = li.where(col("l_shipdate") >= lit("1998-01-01"))
    def run(ra: org.apache.spark.sql.DataFrame, rb: org.apache.spark.sql.DataFrame) =
      Drift.numericDrift(ra, rb, "l_extendedprice").head.toSeq
    assert(run(a, b) == run(a.repartition(13), b.repartition(7)))
  }

  test("categorical: identical distributions measure zero on both statistics") {
    import spark.implicits._
    val side = Seq("a", "a", "b", "c").toDF("x")
    val r = Drift.categoricalDrift(side, side, "x").head
    assert(r.getAs[Long]("n_base") === 4L && r.getAs[Long]("n_cur") === 4L)
    assert(r.getAs[Long]("n_categories") === 3L)
    assert(r.getAs[Double]("chi2") === 0.0)
    assert(r.getAs[Double]("js_divergence") === 0.0)
  }

  test("categorical: disjoint supports saturate JS at ln 2; hand-computed chi2") {
    import spark.implicits._
    val r = Drift.categoricalDrift(
      Seq("a", "a").toDF("x"), Seq("b", "b").toDF("x"), "x").head
    // JS of disjoint distributions = ln 2 (each side's mass halves in m)
    assert(math.abs(r.getAs[Double]("js_divergence") - math.log(2.0)) < 1e-9)
    // 2x2 table [[2,0],[0,2]]: every expected cell is 1 -> chi2 = 4
    assert(r.getAs[Double]("chi2") === 4.0)
  }

  test("categorical: an empty snapshot is refused loudly, not NaN'd") {
    import spark.implicits._
    val some = Seq("a", "b").toDF("x")
    val none = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], some.schema)
    val e1 = intercept[IllegalArgumentException] {
      Drift.categoricalDrift(none, some, "x")
    }
    assert(e1.getMessage.contains("base snapshot has no rows"))
    val e2 = intercept[IllegalArgumentException] {
      Drift.categoricalDrift(some, none, "x")
    }
    assert(e2.getMessage.contains("current snapshot has no rows"))
  }

  test("categorical: null categories are their own drifting class") {
    import spark.implicits._
    val base = Seq(Some("a"), Some("a"), Some("a"), Some("a")).toDF("x")
    val cur = Seq(Some("a"), Some("a"), None, None).toDF("x")
    val r = Drift.categoricalDrift(base, cur, "x").head
    assert(r.getAs[Long]("n_categories") === 2L)
    assert(r.getAs[Double]("chi2") > 0.0)
    assert(r.getAs[Double]("js_divergence") > 0.0)
  }
}
