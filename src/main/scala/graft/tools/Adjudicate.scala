package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{BaselineJar, GraftExtensions, Sessions, SparkEntry}

/** Interleaved HEAD-vs-pinned-baseline-jar adjudicator — the CLI form of
  * Bench's self-adjudication (same rule: [[graft.BaselineJar.adjudicate]])
  * for working a list of flagged queries deliberately, e.g. the standing
  * round-open task "adjudicate last round's regression labels".
  *
  *   runMain graft.tools.Adjudicate q121_bpe_packed_sequences,q83_curation 2 artifacts/r14
  *
  * Per repetition it times each query at HEAD in-process (isolated,
  * post-GC, cache cleared between runs — Bench's recheck discipline),
  * then runs the SAME queries from the pinned baseline jar in a child
  * JVM, so both binaries see the same host in the same minutes — the
  * manual two-worktree interleave of BASELINE.md's r13 seven-query table,
  * automated. Minima across reps feed the drift/code rule; per-rep
  * records land in `outDir` (`adjud_head_rep*.json` / `adjud_base_rep*.
  * json`) and the aggregate in `outDir/ADJUD.json`.
  */
object Adjudicate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Adjudicate <queriesCsv> [reps=2] [outDir=artifacts/adjud]")
    val queries = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val outDir = java.nio.file.Paths.get(
      if (args.length > 2) args(2) else "artifacts/adjud")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runsPerRep = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val jar = BaselineJar.resolve().getOrElse(sys.error(
      s"no pinned baseline jar at ${BaselineJar.defaultPath} " +
        "(or SPARK_GRAFT_BASELINE_JAR) — see artifacts/baseline/BASELINE_JAR.md"))
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in SparkEntry.queries: ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(outDir)

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
    graft.WindowWarnCensus.install() // quiet tail, same as Bench
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def writeJson(path: java.nio.file.Path, m: Seq[(String, Double)]): Unit =
      java.nio.file.Files.writeString(path,
        m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}") + "\n")

    val headMins = scala.collection.mutable.Map.empty[String, Double]
    val baseMins = scala.collection.mutable.Map.empty[String, Double]
    for (rep <- 1 to reps) {
      val head = queries.map { q =>
        System.gc()
        val runs = (1 to runsPerRep).map { _ =>
          val t0 = System.nanoTime()
          val t = try { sink(SparkEntry.queries(q)(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
            catch { case _: Throwable => -1.0 }
          spark.catalog.clearCache()
          t
        }.filter(_ >= 0)
        q -> (if (runs.isEmpty) -1.0 else runs.min)
      }
      writeJson(outDir.resolve(s"adjud_head_rep$rep.json"), head)
      head.foreach { case (q, v) if v >= 0 =>
        headMins(q) = headMins.get(q).fold(v)(math.min(v, _))
      case _ => }
      val base = BaselineJar.benchMinima(jar, sfDir, queries, runsPerRep, cpus, Some(outDir))
      writeJson(outDir.resolve(s"adjud_base_rep$rep.json"), base.toSeq.sorted)
      base.foreach { case (q, v) =>
        baseMins(q) = baseMins.get(q).fold(v)(math.min(v, _))
      }
      println(f"[adjudicate] rep $rep/$reps done: " +
        f"head=${head.map(_._2).filter(_ >= 0).sum}%.2fs base=${base.values.sum}%.2fs")
    }
    val rows = queries.map { q =>
      val h = headMins.getOrElse(q, -1.0)
      val c = baseMins.getOrElse(q, -1.0)
      val v = BaselineJar.adjudicate(h, c)
      println(f"[adjudicate] $q%-36s head_min=$h%8.3f base_jar_min=$c%8.3f -> $v")
      "\"" + q + s"""":{"head_min":$h,"baseline_jar_min":$c,"final":"$v"}"""
    }
    val record = rows.mkString(
      s"""{"jar":"$jar","sf":"$sfDir","reps":$reps,"runs_per_rep":$runsPerRep,"queries":{""",
      ",", "}}")
    java.nio.file.Files.writeString(outDir.resolve("ADJUD.json"), record + "\n")
    Sessions.release(spark, owned)
    println(record)
  }
}
