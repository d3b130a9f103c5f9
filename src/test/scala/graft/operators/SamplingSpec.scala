package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("sample is deterministic and invariant to repartitioning") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"got $frac")
  }

  test("split is disjoint and exhaustive") {
    val (train, holdout) = Sampling.split(docs, "doc_id", 0.2)
    val t = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val h = holdout.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((t & h).isEmpty)
    assert(t.size + h.size === docs.count())
  }
}
