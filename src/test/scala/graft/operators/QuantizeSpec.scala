package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes span the int8 range endpoints and checksum is exact") {
    val out = Quantize.int8Profile(embeddings, "embedding", "vec_id").cache()
    // every non-constant vector's min maps to -128 and max to 127
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("q_min") === -128L)
      assert(r.getAs[Long]("q_max") === 127L)
      assert(r.getAs[Long]("n_dims") > 0)
    }
    out.unpersist()
  }

  test("known vector quantizes exactly") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0f, 1.0f, 2.0f, 4.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Profile(df, "embedding", "vec_id").collect().head
    // mn=0 mx=4: codes = round(x/4*255)-128 = -128, round(63.75)-128=-64,
    // round(127.5)-128=0, 127
    assert(r.getAs[Long]("q_min") === -128L)
    assert(r.getAs[Long]("q_max") === 127L)
    assert(r.getAs[Long]("q_sum") === (-128L - 64L + 0L + 127L))
  }

  test("constant vector maps to all-zero codes with zero error") {
    import spark.implicits._
    val df = Seq((1L, Seq(3.5f, 3.5f, 3.5f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Profile(df, "embedding", "vec_id").collect().head
    assert(r.getAs[Long]("q_min") === 0L)
    assert(r.getAs[Long]("q_max") === 0L)
    assert(r.getAs[Long]("q_sum") === 0L)
    assert(r.getAs[Double]("mse") === 0.0)
  }

  test("native Int8Stats expression is bitwise identical to the HOF formulation") {
    // the real corpus (float arrays) — whole-row equality incl. the mse
    // doubles: same op order, so bitwise, not tolerance-based
    val native = Quantize.int8Profile(embeddings, "embedding", "vec_id")
    val hof = Quantize.int8ProfileHof(embeddings, "embedding", "vec_id")
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("native expression matches HOF on double arrays and edge vectors") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0, 1.0, 2.0, 4.0)),            // the 127.5 HALF_UP tie
      (2L, Seq(3.5, 3.5, 3.5)),                 // constant
      (3L, Seq(-1.25, 0.0, 7.75, -0.5, 3.125)), // negatives
      (4L, Seq(1e-9, -1e-9, 5e-10))             // tiny range
    ).toDF("vec_id", "embedding")
    val native = Quantize.int8Profile(df, "embedding", "vec_id")
    val hof = Quantize.int8ProfileHof(df, "embedding", "vec_id")
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("dequantization error is bounded by half a quantization step") {
    // max |err| per dim <= (mx-mn)/255/2, so mse <= ((mx-mn)/510)^2
    val out = Quantize.int8Profile(embeddings, "embedding", "vec_id")
    val v = embeddings.select(
      col("vec_id"),
      (array_max(col("embedding")) - array_min(col("embedding"))).cast("double").as("range"))
    val joined = out.join(v, "vec_id").collect()
    joined.foreach { r =>
      val bound = math.pow(r.getAs[Double]("range") / 510.0, 2) * 1.01 + 1e-12
      assert(r.getAs[Double]("mse") <= bound,
        s"vec ${r.getAs[Long]("vec_id")} mse ${r.getAs[Double]("mse")} > $bound")
    }
  }

  test("dimStats computes per-dimension count/mean/min/max on a known corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 4.0f)),
      (3L, Seq(-1.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.dimStats(df, "embedding").orderBy("dim").collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 0L && out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === 1.0 && out(0).getDouble(3) === -1.0 && out(0).getDouble(4) === 3.0)
    assert(out(1).getLong(0) === 1L && out(1).getLong(1) === 3L)
    assert(math.abs(out(1).getDouble(2) - (2.0 + 4.0 + 10.0) / 3) < 1e-6)
    assert(out(1).getDouble(3) === 2.0 && out(1).getDouble(4) === 10.0)
  }

  test("pqCodebooks on a hand-checkable corpus: lowest-id seeds, L2 argmin, exact means") {
    import spark.implicits._
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 centroids; seeds = ids 1,2
    val d = Seq(
      (1L, Seq(0.0, 0.0, 10.0, 10.0)),
      (2L, Seq(4.0, 4.0, 20.0, 20.0)),
      (3L, Seq(1.0, 1.0, 21.0, 21.0)),
      (4L, Seq(3.0, 3.0, 11.0, 11.0))
    ).toDF("vec_id", "embedding")
    val cb = Quantize.pqCodebooks(d, "embedding", "vec_id", m = 2, subDim = 2, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    // subspace 0 (dims 0-1): seeds c0=(0,0) c1=(4,4); members c0={v1,v3} c1={v2,v4}
    assert(cb((0L, 0L, 0L)) === ((2L, 0.5)) && cb((0L, 0L, 1L)) === ((2L, 0.5)))
    assert(cb((0L, 1L, 0L)) === ((2L, 3.5)) && cb((0L, 1L, 1L)) === ((2L, 3.5)))
    // subspace 1 (dims 2-3): seeds c0=(10,10) c1=(20,20); members c0={v1,v4} c1={v2,v3}
    assert(cb((1L, 0L, 0L)) === ((2L, 10.5)) && cb((1L, 0L, 1L)) === ((2L, 10.5)))
    assert(cb((1L, 1L, 0L)) === ((2L, 20.5)) && cb((1L, 1L, 1L)) === ((2L, 20.5)))
  }

  test("pqCodes assigns each subvector to its nearest trained centroid") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(0.0, 0.0, 10.0, 10.0)),
      (2L, Seq(4.0, 4.0, 20.0, 20.0)),
      (3L, Seq(1.0, 1.0, 21.0, 21.0)),
      (4L, Seq(3.0, 3.0, 11.0, 11.0))
    ).toDF("vec_id", "embedding")
    val cb = Quantize.pqCodebooks(d, "embedding", "vec_id", m = 2, subDim = 2, k = 2)
    val codes = Quantize.pqCodes(d, "embedding", "vec_id", cb, m = 2, subDim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // trained centroids: sub0 c0=(0.5,0.5) c1=(3.5,3.5); sub1 c0=(10.5,10.5) c1=(20.5,20.5)
    assert(codes === Map(
      (1L, 0L) -> 0L, (1L, 1L) -> 0L,
      (2L, 0L) -> 1L, (2L, 1L) -> 1L,
      (3L, 0L) -> 0L, (3L, 1L) -> 1L,
      (4L, 0L) -> 1L, (4L, 1L) -> 0L))
  }

  test("pq training + assignment is invariant to input partitioning") {
    val cbA = Quantize.pqCodebooks(embeddings, "embedding", "vec_id", 4, 16, 8)
    val cbB = Quantize.pqCodebooks(embeddings.repartition(13), "embedding", "vec_id", 4, 16, 8)
    assert(cbA.exceptAll(cbB).isEmpty && cbB.exceptAll(cbA).isEmpty)
    val cA = Quantize.pqCodes(embeddings, "embedding", "vec_id", cbA, 4, 16)
    val cB = Quantize.pqCodes(embeddings.repartition(7), "embedding", "vec_id", cbA, 4, 16)
    assert(cA.exceptAll(cB).isEmpty && cB.exceptAll(cA).isEmpty)
  }

  test("pqCodes plan: codebook broadcasts; argmin aggregates map-side, no window, no sort-merge") {
    val cb = Quantize.pqCodebooks(embeddings, "embedding", "vec_id", 4, 16, 8)
    val plan = Quantize.pqCodes(embeddings, "embedding", "vec_id", cb, 4, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"codebook not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the codebook join:\n$plan")
    // argmin must be min(struct) — a partial+final aggregation pair (struct
    // buffers plan as SortAggregate: per-partition sort, still map-side
    // combined so the exchange carries one candidate per (vid, ss) per map
    // task), never a rank window over the k-way fan-out
    // the only legitimate Window is the dense seed-id assignment over the
    // <=k seed rows (unpartitioned, inside the broadcast codebook
    // subtree — its node can print more than once under adaptive reuse);
    // the corpus-side argmin must NEVER be a window, and that regression
    // would partition by the per-vector key
    assert(!plan.contains("windowspecdefinition(__vid"),
      s"corpus argmin regressed to a per-vector window:\n$plan")
    assert(plan.contains("partial_min"),
      s"argmin no longer combines map-side:\n$plan")
  }

  test("dimStats covers every dimension with full count and is partitioning-invariant") {
    val a = Quantize.dimStats(embeddings, "embedding").orderBy("dim").collect()
    val b = Quantize.dimStats(embeddings.repartition(13), "embedding").orderBy("dim").collect()
    val n = embeddings.count()
    assert(a.length === 64)
    assert(a.forall(_.getLong(1) === n))
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }
}
