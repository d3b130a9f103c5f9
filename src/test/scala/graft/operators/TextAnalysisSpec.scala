package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token count: whitespace runs collapse") {
    val d = Seq((1L, "one two  three\t four"), (2L, "single")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 4L)
    assert(out(2L) === 1L)
  }

  test("subword count splits letters/digits/punct") {
    val d = Seq((1L, "abc123!x")).toDF("doc_id", "text")
    // "abc", "1", "2", "3", "!", "x" → 6
    val out = d.select(TextAnalysis.subwordCount(col("text"))).collect()(0).getLong(0)
    assert(out === 6L)
  }

  test("language id picks the language with most marker hits") {
    val d = Seq(
      (1L, "the cat and the dog of the house to go in style"),
      (2L, "el perro y la casa de que el gato y la luna"),
      (3L, "der hund und die katze das ist und der haus")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLanguageId(d, "text").select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "de")
  }

  test("quality signals compute deterministic ratios") {
    val d = Seq((1L, "the cat!!")).toDF("doc_id", "text")
    val r = TextAnalysis.withQualitySignals(d, "text").collect()(0)
    assert(r.getAs[Long]("n_chars") === 9L)
    assert(r.getAs[Long]("n_tokens") === 2L)
    assert(r.getAs[Long]("n_punct") === 2L)
    assert(r.getAs[Long]("n_stop") === 1L)  // 'the'
    // 1/2 - 2/9 = 0.2778
    assert(math.abs(r.getAs[Double]("quality_score") - 0.2778) < 1e-9)
  }

  test("fingerprint is stable and edit-sensitive only near the minimal shingle") {
    val d = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("fingerprintAgg equals the inline-HOF fingerprint on real docs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
      .union(Seq((9001L, "one two three", "en", "t", 13L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hof = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agg = TextAnalysis.fingerprintAgg(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(agg === hof, "explode+min-agg plan must reproduce the HOF column exactly (incl. short docs)")
  }
}
