package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r16 optimization probe: run ONE SparkEntry query through the noop sink
  * with a job listener attached, then print every Spark job's wall time and
  * call site — the attribution layer the disabled UI would have given us.
  * `runMain graft.OptProbeR16 <query> [sfDir] [cpus]`. Measurement only;
  * never part of a query path.
  */
object OptProbeR16 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.files.openCostInBytes", "262144"))
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))

    case class Job(id: Int, var site: String = "", var t0: Long = 0L,
                   var t1: Long = 0L, var nTasks: Int = 0, var stages: Int = 0,
                   var stageIds: Seq[Int] = Nil)
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, Job]
    // r17: stage names (the RDD call sites) give the attribution the empty
    // job-level callSite.short never did under the SQL execution engine
    val stageNames = scala.collection.concurrent.TrieMap.empty[Int, String]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, Job(e.jobId))
        j.t0 = e.time
        // properties can be null on jobs submitted without a properties
        // bag (ADVICE r16): an NPE here is swallowed by the listener bus
        // and silently drops the job's attribution row
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        j.stages = e.stageIds.size
        j.stageIds = e.stageIds
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageNames.put(e.stageInfo.stageId,
          e.stageInfo.name.take(90) + " [" + e.stageInfo.numTasks + " tasks]")
    }

    // warm run (JIT/codegen/file listing), untimed, unlisten-ed
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val tWarm = once()
    spark.catalog.clearCache()
    spark.sparkContext.addSparkListener(listener)
    val tMeas = once()
    spark.catalog.clearCache()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    println(f"\n=== $name warm=$tWarm%.2fs measured=$tMeas%.2fs jobs=${jobs.size} ===")
    val rows = jobs.values.toSeq.sortBy(_.id)
    val bySite = rows.groupBy(_.site).map { case (s, js) =>
      (s, js.map(j => (j.t1 - j.t0) / 1e3).sum, js.size)
    }.toSeq.sortBy(-_._2)
    println(f"--- per-job (id, sec, stages, site) ---")
    rows.foreach { j =>
      println(f"${j.id}%4d ${(j.t1 - j.t0) / 1e3}%8.3f ${j.stages}%3d  ${j.site}")
      j.stageIds.sorted.foreach { sid =>
        stageNames.get(sid).foreach(n => println(f"        s$sid%-5d $n"))
      }
    }
    println(f"--- by call site (sec, njobs, site) ---")
    bySite.foreach { case (s, sec, n) => println(f"$sec%8.3f $n%4d  $s") }
    println(f"sum of job wall times: ${rows.map(j => (j.t1 - j.t0) / 1e3).sum}%.2f s (gaps = driver-side work)")
    Sessions.release(spark, owned)
  }
}
