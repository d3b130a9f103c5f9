package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.window.WindowExec

/** One-off census (test scope): print every registered query whose
  * pre-AQE physical plan contains a partition-less WindowExec, with the
  * window functions involved. Used to build PlanInvariantSpec's audited
  * whitelist; not part of the suite.
  */
object WindowCensus {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.acquire(org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))._1
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val eager = Set("q57_dedup_clusters", "q61_dedup_retention", "q180_dedup_clusters_lsh",
      "q70_retain_canonical", "q83_curation", "q117_retain_central", "q69_incremental_dim",
      "q142_entity_resolution", "q146_incremental_entity_resolution", "q153_triangle_stats",
      "q155_lsa_topic", "q156_lsa_doc_scores", "q159_lsa_topics", "q162_hits",
      "q163_label_prop", "q169_kcore", "q173_ppmi_lsa")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!eager.contains(name)) {
        try {
          val plan = fn(spark, dir).queryExecution.sparkPlan
          val bare = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
          if (bare.nonEmpty)
            println(s"[census] $name: ${bare.size} partition-less WindowExec: " +
              bare.map(_.windowExpression.map(_.sql).mkString(",")).mkString(" | ").take(300))
        } catch {
          case e: Throwable => println(s"[census] $name: ERROR ${e.getMessage}")
        }
      }
    }
    println("[census] done")
  }
}
