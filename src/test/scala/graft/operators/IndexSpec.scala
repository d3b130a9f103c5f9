package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("postings on a known corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "THE  cat")
    ).toDF("doc_id", "text")
    val out = Index.invertedIndex(df, "text", "doc_id").collect()
      .map(r => (r.getAs[String]("term"),
        (r.getAs[Long]("doc_freq"), r.getAs[Long]("term_freq"), r.getAs[String]("postings"))))
      .toMap
    assert(out("the") === ((3L, 3L, "1,2,3")))
    assert(out("cat") === ((2L, 2L, "1,3")))
    assert(out("sat") === ((2L, 2L, "1,2")))
    assert(out("dog") === ((1L, 1L, "2")))
  }

  test("minDf drops the hapax tail and maxPostings truncates head terms") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, s"common unique$i")).toDF("doc_id", "text")
    val out = Index.invertedIndex(df, "text", "doc_id", minDf = 2, maxPostings = 5)
    val rows = out.collect()
    assert(rows.length === 1) // only "common" survives minDf=2
    val r = rows.head
    assert(r.getAs[String]("term") === "common")
    assert(r.getAs[Long]("doc_freq") === 30L)
    assert(r.getAs[String]("postings") === "1,2,3,4,5") // sorted THEN truncated
  }

  test("mergeIndex covers all three term dispositions on a known corpus") {
    import spark.implicits._
    val baseDocs = Seq((1L, "the cat sat"), (2L, "the dog sat")).toDF("doc_id", "text")
    val incDocs = Seq((3L, "the cat runs fast")).toDF("doc_id", "text")
    val base = Index.invertedIndex(baseDocs, "text", "doc_id")
    val out = Index.mergeIndex(base, incDocs, "text", "doc_id").collect()
      .map(r => (r.getAs[String]("term"),
        (r.getAs[Long]("doc_freq"), r.getAs[Long]("term_freq"), r.getAs[String]("postings"))))
      .toMap
    assert(out("the") === ((3L, 3L, "1,2,3"))) // in both
    assert(out("cat") === ((2L, 2L, "1,3")))   // in both
    assert(out("dog") === ((1L, 1L, "2")))     // base only — passes through
    assert(out("runs") === ((1L, 1L, "3")))    // increment only
    assert(out.keySet === Set("the", "cat", "sat", "dog", "runs", "fast"))
  }

  test("mergeIndex equals a full rebuild on the real corpus, incl. minDf/maxPostings") {
    val base = Index.invertedIndex(
      docs.where(pmod(col("doc_id"), lit(10)) =!= 0), "text", "doc_id")
    val merged = Index.mergeIndex(base,
        docs.where(pmod(col("doc_id"), lit(10)) === 0), "text", "doc_id",
        minDf = 3, maxPostings = 12)
      .orderBy("term").collect().map(_.toString).toSeq
    val rebuilt = Index.invertedIndex(docs, "text", "doc_id",
        minDf = 3, maxPostings = 12)
      .orderBy("term").collect().map(_.toString).toSeq
    assert(rebuilt.nonEmpty && merged === rebuilt)
  }

  test("mergeIndex over a term-bucketed stored index: zero exchange on the base side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_bucket").toString
    val wh = graft.etl.ParquetWarehouse(spark, dir)
    val base = Index.invertedIndex(
      docs.where(pmod(col("doc_id"), lit(10)) =!= 0), "text", "doc_id")
    wh.writeBucketed("b_index", base, 4, Seq("term"), Seq("term"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = Index.mergeIndex(wh.readTable("b_index"),
        docs.where(pmod(col("doc_id"), lit(10)) === 0), "text", "doc_id")
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      merged.count() // finalize AQE
      val root = merged.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val smj = root.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge full-outer merge:\n$root")
      // base is the LEFT side of the full-outer join in mergeIndex
      val baseShuffles = smj.head.left.collect { case e: ShuffleExchangeLike => e }
      assert(baseShuffles.isEmpty,
        s"stored bucketed index must not re-shuffle on merge:\n$root")
      // only the increment's term aggregation shuffles
      val all = root.collect { case e: ShuffleExchangeLike => e }
      assert(all.size === 1, s"expected exactly one exchange (increment agg):\n$root")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_index")
    }
  }

  test("invariants on the real corpus: df <= tf, postings sorted ascending") {
    val out = Index.invertedIndex(docs, "text", "doc_id", minDf = 2, maxPostings = 20)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df0 = r.getAs[Long]("doc_freq"); val tf = r.getAs[Long]("term_freq")
      assert(df0 <= tf, s"term ${r.getAs[String]("term")}")
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length === math.min(df0, 20L).toInt)
      assert(ids.sameElements(ids.sorted), s"unsorted postings for ${r.getAs[String]("term")}")
    }
  }

  test("result is invariant to input partitioning") {
    val a = Index.invertedIndex(docs, "text", "doc_id", minDf = 2, maxPostings = 20)
    val b = Index.invertedIndex(docs.repartition(13), "text", "doc_id", minDf = 2, maxPostings = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("bm25 matches the hand-computed formula on a known corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark join spark"),
      (2L, "join fast"),
      (3L, "other words here")
    ).toDF("doc_id", "text")
    val out = Index.bm25TopK(df, "text", "doc_id", Seq("spark", "join"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("score"))).toMap
    val (k1, b) = (1.2, 0.75)
    val n = 3.0; val avgdl = 8.0 / 3.0
    def term(tf: Double, df0: Double, dl: Double): Double =
      math.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === ((3L, r4(term(2, 1, 3) + term(1, 2, 3)))))
    assert(out(2L) === ((2L, r4(term(1, 2, 2)))))
    assert(!out.contains(3L)) // no query term -> score 0 -> dropped
  }

  test("bm25 is invariant to input partitioning and caps at topK") {
    val a = Index.bm25TopK(docs, "text", "doc_id", Seq("spark", "shuffle", "join"), topK = 15)
    val b = Index.bm25TopK(docs.repartition(13), "text", "doc_id",
      Seq("spark", "shuffle", "join"), topK = 15)
    val ra = a.collect(); val rb = b.collect()
    assert(ra.length <= 15 && ra.nonEmpty)
    assert(ra.map(_.toString).toSeq === rb.map(_.toString).toSeq)
  }

  test("rrfFuse combines two ranked lists with reciprocal-rank scores") {
    import spark.implicits._
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val b = Seq((2L, 9.0), (3L, 8.0), (4L, 7.0)).toDF("doc_id", "cos")
    val out = Index.rrfFuse(a, b, "doc_id", "score", "cos", topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // fused order: 2 (1/62+1/61) > 3 (1/63+1/62) > 1 (1/61) > 4 (1/63)
    assert(out.map(_._1).toSeq === Seq(2L, 3L, 1L, 4L))
    assert(out(0) === ((2L, 2L, 1L, r6(1.0 / 62 + 1.0 / 61))))
    assert(out(1) === ((3L, 3L, 2L, r6(1.0 / 63 + 1.0 / 62))))
    assert(out(2) === ((1L, 1L, 0L, r6(1.0 / 61)))) // absent from b -> rank_b 0
    assert(out(3) === ((4L, 0L, 3L, r6(1.0 / 63)))) // absent from a -> rank_a 0
  }

  test("batch bm25 equals the single-query path for the shared term set") {
    import spark.implicits._
    val qs = graft.queries.DocQueries.Bm25BatchQueries.toDF("query_id", "term")
    val batch = Index.bm25TopKBatch(docs, "text", "doc_id", qs, topK = 15)
      .where(col("query_id") === 1L)
      .select("doc_id", "n_tokens", "score")
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
    val single = Index.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "shuffle", "join"), topK = 15).collect()
    assert(batch.length === single.length && batch.nonEmpty)
    batch.zip(single).foreach { case (bRow, sRow) =>
      assert(bRow.getAs[Long]("doc_id") === sRow.getAs[Long]("doc_id"))
      assert(bRow.getAs[Long]("n_tokens") === sRow.getAs[Long]("n_tokens"))
      // batch quantizes per-term contributions to DECIMAL(28,9) before the
      // group sum (partition-order invariance); the single-query path sums
      // doubles in fixed term order — equal to well past the 4-decimal
      // presentation rounding, but not guaranteed bitwise
      assert(math.abs(bRow.getAs[Double]("score") - sRow.getAs[Double]("score")) < 1e-6,
        s"doc ${bRow.getAs[Long]("doc_id")}")
    }
  }

  test("batch bm25 matches the hand-computed formula per query") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark join spark"),
      (2L, "join fast"),
      (3L, "other words here")
    ).toDF("doc_id", "text")
    val qs = Seq((10L, "spark"), (10L, "join"), (20L, "fast"))
      .toDF("query_id", "term")
    val out = Index.bm25TopKBatch(df, "text", "doc_id", qs, topK = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("score"))).toMap
    val (k1, b) = (1.2, 0.75)
    val n = 3.0; val avgdl = 8.0 / 3.0
    def term(tf: Double, df0: Double, dl: Double): Double =
      math.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((10L, 1L)) === ((3L, r4(term(2, 1, 3) + term(1, 2, 3)))))
    assert(out((10L, 2L)) === ((2L, r4(term(1, 2, 2)))))
    assert(out((20L, 2L)) === ((2L, r4(term(1, 1, 2)))))
    // docs without a query term never appear for that query
    assert(out.keySet === Set((10L, 1L), (10L, 2L), (20L, 2L)))
  }

  test("batch bm25 is invariant to input partitioning") {
    import spark.implicits._
    val qs = graft.queries.DocQueries.Bm25BatchQueries.toDF("query_id", "term")
    val a = Index.bm25TopKBatch(docs, "text", "doc_id", qs, topK = 10)
      .orderBy("query_id", "doc_id").collect()
    val b = Index.bm25TopKBatch(docs.repartition(13), "text", "doc_id", qs, topK = 10)
      .orderBy("query_id", "doc_id").collect()
    assert(a.nonEmpty && a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("batch bm25 plan: WindowGroupLimit top-k, broadcast query joins, one cached index") {
    import spark.implicits._
    val qs = graft.queries.DocQueries.Bm25BatchQueries.toDF("query_id", "term")
    val out = Index.bm25TopKBatch(docs, "text", "doc_id", qs, topK = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must pre-prune as WindowGroupLimit, not a bare filter after Window")
    assert(plan.contains("BroadcastHashJoin"),
      "query-term and df tables must broadcast onto the index")
    assert(plan.contains("InMemoryTableScan"),
      "the (doc, term) index must be persisted across its three consumers")
    assert(!plan.contains("SortMergeJoin") ||
      "InMemoryTableScan".r.findAllIn(plan).size >= 2,
      "tf index recomputed instead of read from cache")
  }

  test("bm25TopKFromIndex on a stored index equals the inline batch path") {
    import spark.implicits._
    val qs = graft.queries.DocQueries.Bm25BatchQueries.toDF("query_id", "term")
    // a warehouse-stored (doc, term, tf) index — built here once, as a
    // production pipeline would persist it
    val stored = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val fromIndex = Index.bm25TopKFromIndex(stored, "doc_id", qs, topK = 10)
      .orderBy("query_id", "doc_id").collect().map(_.toString).toSeq
    val inline = Index.bm25TopKBatch(docs, "text", "doc_id", qs, topK = 10)
      .orderBy("query_id", "doc_id").collect().map(_.toString).toSeq
    assert(fromIndex.nonEmpty && fromIndex === inline)
  }

  test("rrfFuse rejects inputs without a static row bound") {
    import spark.implicits._
    val bounded = Seq((1L, 1.0)).toDF("doc_id", "s")
    // a parquet scan has no static row bound — exactly the misuse to refuse
    val unbounded = docs.select(col("doc_id"), col("n_chars").cast("double").as("s"))
    val e = intercept[IllegalArgumentException] {
      Index.rrfFuse(unbounded, bounded, "doc_id", "s", "s", topK = 5)
    }
    assert(e.getMessage.contains("statically bounded"))
    val e2 = intercept[IllegalArgumentException] {
      Index.rrfFuse(bounded, unbounded, "doc_id", "s", "s", topK = 5)
    }
    assert(e2.getMessage.contains("'b'"))
    // the same corpus-shaped input IS accepted once truncated
    val ok = Index.rrfFuse(bounded, unbounded.limit(5), "doc_id", "s", "s", topK = 5)
    assert(ok.count() >= 1)
  }

  test("a bm25TopKBatch per-query slice feeds rrfFuse via the documented .limit") {
    // the scaladoc'd composition: the per-query row_number filter drops
    // the static row bound, so a slice re-bounds with .limit(topK) (a
    // runtime no-op — the slice already has <= topK rows) and then fuses
    import spark.implicits._
    val qs = graft.queries.DocQueries.Bm25BatchQueries.toDF("query_id", "term")
    val lexical = Index.bm25TopKBatch(docs, "text", "doc_id", qs, topK = 10)
      .where(col("query_id") === 1L)
      .select(col("doc_id"), col("score"))
      .limit(10)
    val dense = lexical.select(col("doc_id"), (col("score") * 0.5).as("cos")).limit(10)
    val fused = Index.rrfFuse(lexical, dense, "doc_id", "score", "cos", topK = 5)
      .collect()
    assert(fused.nonEmpty && fused.length <= 5)
    // both lists rank identically here, so rrf is symmetric: rank_a == rank_b
    fused.foreach(r => assert(r.getAs[Long]("rank_a") === r.getAs[Long]("rank_b")))
  }

  test("rrfFuse truncates to topK and breaks score ties by id") {
    import spark.implicits._
    val a = Seq((5L, 1.0), (6L, 1.0)).toDF("doc_id", "s") // tied scores
    val b = Seq((6L, 1.0), (5L, 1.0)).toDF("doc_id", "s")
    val out = Index.rrfFuse(a, b, "doc_id", "s", "s", topK = 1).collect()
    // both lists rank 5 before 6 on the id tiebreak; 5 wins the fused tie too
    assert(out.length === 1 && out(0).getLong(0) === 5L)
  }
}
