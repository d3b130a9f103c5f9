package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry query —
  * `runMain graft.Explain <queryName> [sfDir]`. Used to audit that scans
  * prune/push down, joins broadcast where intended, and hot operators stay
  * inside WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).explain("formatted")
    Sessions.release(spark, owned)
  }
}
