package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Micro-benchmark justifying the [[TextAnalysis.explodedShingles]] plan
  * choice: three semantically identical shingling plans over the sf0.1
  * corpus replicated ×50 (12M shingles). Measured (local[32]):
  *
  *   - lead-window form (doc-keyed exchange, codegen'd): 9.4 s
  *   - transform-HOF array form (no exchange, interpreted lambdas): 163 s
  *   - position-generate + codegen'd slice/array_join (the kernel,
  *     no exchange): 2.6 s
  *
  * The HOF form shows why "shuffle-free" alone is not the win: higher-
  * order-function lambdas are interpreted per element, costing 60× the
  * codegen'd projection. Run:
  * `sbt "runMain graft.ShingleBench"`.
  */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val corpus = docs.crossJoin(spark.range(50).toDF("__r"))
      .select((col("doc_id") + col("__r") * stride).as("doc_id"), col("text"))
      .localCheckpoint(true)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    val k = 7
    t("lead-window form") {
      import org.apache.spark.sql.expressions.Window
      val words = corpus.where(col("text").isNotNull).select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("__p", "__w")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("__p"))
      val leads = (1 until k).map(i => lead(col("__w"), i).over(w))
      words.select(col("doc_id"), col("__p"),
          concat_ws(" ", (col("__w") +: leads): _*).as("__sh"),
          leads.last.isNotNull.as("__full"))
        .where(col("__full") || col("__p") === 0)
        .count()
    }
    t("transform-HOF array form") {
      val words = split(trim(lower(col("text"))), "\\s+")
      val arr = transform(sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
        i => array_join(slice(words, i, lit(k)), " "))
      corpus.where(col("text").isNotNull)
        .select(col("doc_id"), explode(arr).as("sh"))
        .count()
    }
    t("position generate + codegen slice (the kernel)") {
      TextAnalysis.explodedShingles(corpus, "text", "doc_id", k).count()
    }
    spark.stop()
  }
}
