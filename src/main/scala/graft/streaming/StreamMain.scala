package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI entry: run the hourly-windowed streaming aggregation over a testdata
  * dir with Trigger.AvailableNow (the daily-batch cadence upgrade path) and
  * print the closed windows.
  *
  * Usage: runMain graft.streaming.StreamMain [sfDir]
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Only stop a session this main created — getOrCreate joins a host
    // JVM's live session and stopping that would kill the host's work.
    val (spark, owned) = graft.Sessions.acquire(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")
    val out = EventsStream.runAvailableNow(spark,
      EventsStream.hourlyAgg(EventsStream.readEvents(spark, dir)), "hourly_cli")
    val rows = out.orderBy("hour_ts", "event_type").collect()
    println(s"[stream] closed windows: ${rows.length}")
    rows.take(5).foreach(r => println(s"  ${r.mkString(" | ")}"))
    graft.Sessions.release(spark, owned)
  }
}
