package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Micro-benchmark justifying the [[TextAnalysis.explodedShingles]] plan
  * choice: four semantically identical shingling plans over the sf0.1
  * corpus replicated ×50 (12M 7-gram shingles), each drained through
  * sum(xxhash64(shingle)) so Catalyst cannot prune the shingle
  * construction (a bare count() WOULD prune it and time nothing — that
  * exact trap mis-measured the explode-beside-array form as 2.6 s when
  * its real cost is quadratic). Measured (local[32]):
  *
  *   - lead-window form (doc-keyed exchange, codegen'd): 13.1 s
  *   - explode positions beside the kept word array: the Generate
  *     operator copies the whole array into every output row —
  *     O(words²) bytes/doc — 141.8 s
  *   - transform-HOF array form (no exchange, interpreted lambdas): 148.3 s
  *   - native WordShingles generator (one compiled pass per document,
  *     narrow rows, no exchange): 7.5 s  ← the kernel
  *
  * All four drain to the same sink hash — the forms are bit-identical,
  * only their plans differ.
  *
  * Run: `sbt "runMain graft.ShingleBench"`.
  */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val (spark, owned) = Sessions.acquire(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val corpus = docs.crossJoin(spark.range(50).toDF("__r"))
      .select((col("doc_id") + col("__r") * stride).as("doc_id"), col("text"))
      .localCheckpoint(true)
    // non-prunable sink: forces every shingle string to materialize
    def drain(df: org.apache.spark.sql.DataFrame, shCol: String): Long =
      df.agg(sum(xxhash64(col(shCol)))).head.getLong(0)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s (sink $n)")
    }
    val k = 7
    t("lead-window form") {
      import org.apache.spark.sql.expressions.Window
      val words = corpus.where(col("text").isNotNull).select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("__p", "__w")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("__p"))
      val leads = (1 until k).map(i => lead(col("__w"), i).over(w))
      drain(words.select(col("doc_id"), col("__p"),
          concat_ws(" ", (col("__w") +: leads): _*).as("__sh"),
          leads.last.isNotNull.as("__full"))
        .where(col("__full") || col("__p") === 0), "__sh")
    }
    t("explode positions beside kept array") {
      val words = split(trim(lower(col("text"))), "\\s+")
      drain(corpus.where(col("text").isNotNull)
        .select(col("doc_id"), words.as("__ws"),
          explode(sequence(lit(1), greatest(size(words) - (k - 1), lit(1)))).as("__p"))
        .select(col("doc_id"),
          array_join(slice(col("__ws"), col("__p"), lit(k)), " ").as("__sh")), "__sh")
    }
    t("transform-HOF array form") {
      val words = split(trim(lower(col("text"))), "\\s+")
      val arr = transform(sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
        i => array_join(slice(words, i, lit(k)), " "))
      drain(corpus.where(col("text").isNotNull)
        .select(col("doc_id"), explode(arr).as("__sh")), "__sh")
    }
    t("native WordShingles generator (the kernel)") {
      drain(TextAnalysis.explodedShingles(corpus, "text", "doc_id", k), "__sh")
    }
    Sessions.release(spark, owned)
  }
}
