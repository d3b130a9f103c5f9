package graft

import java.nio.file.{Files, Path, Paths}

/** Runs `graft.Bench` from the PINNED BASELINE JAR in a child JVM — the
  * structural end of the drift-chasing loop (rounds 11–13 each spent a
  * task hand-bisecting worktrees to decide whether a flagged bench
  * number was host drift or a code regression).
  *
  * `artifacts/baseline/graft-baseline.jar` is `sbt package` output of the
  * commit whose sweep produced `BENCH_BASELINE.json` (provenance:
  * `artifacts/baseline/BASELINE_JAR.md`; refresh the jar whenever the
  * baseline record is refreshed). When a recheck says `regression`,
  * re-running the SAME query from that jar on the SAME host in the SAME
  * hour separates the two possible causes mechanically:
  *
  *   - the old binary ALSO runs elevated  → the host moved → `drift`
  *   - the old binary hits its recorded number while HEAD cannot → `code`
  *
  * This is the manual worktree-bisect playbook (BASELINE.md r13
  * seven-query table), automated. The child classpath is the pinned jar
  * plus the Spark distribution jars the CURRENT process runs on (located
  * from SparkSession's code source), so old code runs on the identical
  * Spark runtime; the child gets its own scratch cwd, so its
  * `BENCH_BASELINE.json` lookup misses and no recursive recheck runs.
  */
object BaselineJar {

  val defaultPath = "artifacts/baseline/graft-baseline.jar"

  /** The pinned jar to adjudicate against, if one is configured and
    * present. `SPARK_GRAFT_BASELINE_JAR=` (empty) disables adjudication
    * explicitly; a missing file disables it silently (first round the
    * mechanism exists, or a fresh clone without artifacts).
    */
  def resolve(): Option[String] = {
    val p = sys.env.getOrElse("SPARK_GRAFT_BASELINE_JAR", defaultPath)
    if (p.nonEmpty && Files.exists(Paths.get(p)))
      Some(Paths.get(p).toAbsolutePath.normalize.toString)
    else None
  }

  /** HEAD's own code location (the classes directory under sbt, the
    * assembled jar in production) — lets the recheck run the CURRENT
    * build in a child JVM through the exact same [[benchMinima]] path as
    * the pinned jar. Measuring HEAD inside the parent at the END of a
    * full sweep and the jar in a pristine child is systematically unfair
    * to HEAD (code-cache/GC/plan-cache pollution): the r14 final sweep
    * mislabeled 12 queries `code` that way, and the symmetric
    * fresh-child interleave (tools.Adjudicate) re-adjudicated all 12 to
    * drift.
    */
  def ownCodeLocation: Option[String] =
    Option(SparkEntry.getClass.getProtectionDomain.getCodeSource)
      .map(cs => new java.io.File(cs.getLocation.toURI).getAbsolutePath)

  /** Directory of the Spark distribution jars for the child classpath.
    * The SparkSession class's code-source parent is the natural answer —
    * but sbt's forked `run` stages each unmanaged jar in its OWN
    * `target/bg-jobs/.../` directory, where a wildcard classpath entry would see
    * one jar and no scala-library. So: env override first, then the
    * code-source parent only if it actually looks like a distribution
    * (many jars), then the stock `/opt/spark/jars`.
    */
  private[graft] def sparkJarsDir: String = {
    def isDist(d: Path): Boolean = Files.isDirectory(d) && {
      val s = Files.list(d)
      try s.filter(p => p.getFileName.toString.endsWith(".jar")).count() > 50
      finally s.close()
    }
    sys.env.get("SPARK_GRAFT_SPARK_JARS")
      .filter(p => Files.isDirectory(Paths.get(p)))
      .getOrElse {
        val fromCodeSource = Paths.get(classOf[org.apache.spark.sql.SparkSession]
          .getProtectionDomain.getCodeSource.getLocation.toURI)
          .getParent.toAbsolutePath
        if (isDist(fromCodeSource)) fromCodeSource.toString
        else if (isDist(Paths.get("/opt/spark/jars"))) "/opt/spark/jars"
        else fromCodeSource.toString
      }
  }

  /** Same list as build.sbt / JavaModuleOptions.defaultModuleOptions():
    * the child creates a SparkSession outside spark-submit on JDK 17+.
    */
  private val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** The old registry may lack queries added since the jar was pinned;
    * its Bench fails fast naming them. Parse them out so one retry can
    * run the intersection instead of adjudicating nothing.
    */
  private[graft] def parseUnknownNames(log: String): Set[String] = {
    val marker = "names not in SparkEntry.queries: "
    log.linesIterator.find(_.contains(marker)).map { line =>
      line.substring(line.indexOf(marker) + marker.length)
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
    }.getOrElse(Set.empty)
  }

  /** Per-query minima (seconds) of one child `graft.Bench` sweep over
    * `queries` from the pinned jar. Queries absent from the old registry
    * are dropped (one retry on the intersection); a child that fails or
    * times out anyway yields an empty map — callers treat a missing key
    * as "could not adjudicate", never as a verdict.
    */
  def benchMinima(jar: String, sfDir: String, queries: Seq[String],
                  runs: Int, cpus: String,
                  logDir: Option[Path] = None): Map[String, Double] = {
    if (queries.isEmpty) return Map.empty
    runOnce(jar, sfDir, queries, runs, cpus, logDir) match {
      case Right(m) => m
      case Left(unknown) =>
        val known = queries.filterNot(unknown.contains)
        if (unknown.nonEmpty && known.nonEmpty)
          runOnce(jar, sfDir, known, runs, cpus, logDir)
            .getOrElse(Map.empty)
        else Map.empty
    }
  }

  /** Left(unknownNames) when the old registry rejected the query list;
    * Right(minima) on success; Right(empty) on any other failure.
    */
  private def runOnce(jar: String, sfDir: String, queries: Seq[String],
                      runs: Int, cpus: String,
                      logDir: Option[Path]): Either[Set[String], Map[String, Double]] = {
    val scratch = Files.createTempDirectory("graft-basejar")
    val outFile = scratch.resolve("bench_out.json")
    val logFile = logDir.map(d => d.resolve(
        s"basejar_${System.currentTimeMillis()}.log"))
      .getOrElse(scratch.resolve("child.log"))
    Option(logFile.getParent).foreach(Files.createDirectories(_))
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
    val cp = jar + java.io.File.pathSeparator + sparkJarsDir + "/*"
    val cmd: Seq[String] =
      Seq(javaBin) ++ addOpens ++ Seq(s"-Xmx$mem", "-cp", cp, "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(scratch.toFile) // own cwd: no BENCH_BASELINE.json → no recursive recheck
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile.toFile)
    val env = pb.environment()
    env.put("SPARK_GRAFT_ONLY", queries.mkString(","))
    env.put("SPARK_GRAFT_SF_DIR", sfDir)
    env.put("SPARK_GRAFT_RUNS", runs.toString)
    env.put("SPARK_GRAFT_CPUS", cpus)
    env.put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
    val timeoutSec = sys.env.get("SPARK_GRAFT_ADJ_TIMEOUT_SEC")
      .map(_.toLong).getOrElse(1800L)
    // Both child sides must run UN-BUDGETED (ADVICE r15): a HEAD-side
    // child would otherwise enforce Bench's wall-clock budget (degrading
    // run counts / skipping queries on a slow host) while the pinned old
    // jar's Bench predates the knob and ignores it — an asymmetry that
    // biases minima toward 'code' labels. The existing ADJ timeout above
    // is the only wall-clock bound either side gets.
    env.put("SPARK_GRAFT_BENCH_BUDGET_SEC", timeoutSec.toString)
    val proc = pb.start()
    val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      proc.destroyForcibly()
      System.err.println(s"[baseline-jar] child timed out after ${timeoutSec}s; log: $logFile")
      return Right(Map.empty)
    }
    if (proc.exitValue() != 0) {
      val log = scala.util.Try(Files.readString(logFile)).getOrElse("")
      val unknown = parseUnknownNames(log)
      if (unknown.nonEmpty) return Left(unknown)
      System.err.println(s"[baseline-jar] child exited ${proc.exitValue()}; log: $logFile")
      return Right(Map.empty)
    }
    Right(parseMinima(scala.util.Try(Files.readString(outFile)).getOrElse("")))
  }

  /** Extract per-query `spread.min` from a Bench full record. */
  private[graft] def parseMinima(record: String): Map[String, Double] = {
    import org.json4s._
    scala.util.Try {
      org.json4s.jackson.JsonMethods.parse(record) \ "spread" match {
        case JObject(fields) => fields.flatMap { case (q, v) =>
          v \ "min" match {
            case JDouble(d) if d >= 0 => Some(q -> d)
            case JInt(i) if i >= 0 => Some(q -> i.toDouble)
            case _ => None
          }
        }.toMap
        case _ => Map.empty[String, Double]
      }
    }.getOrElse(Map.empty)
  }

  /** The adjudication rule, shared by Bench's auto-recheck and the
    * `graft.tools.Adjudicate` CLI: HEAD is judged against the OLD BINARY
    * ON TODAY'S HOST, not against the recorded number — that is the whole
    * point (the record was measured in a different hour's host state).
    * A 10% relative + 0.05 s absolute envelope mirrors the recheck rule's
    * shape (sub-second queries need the absolute term).
    */
  def adjudicate(headMin: Double, jarMin: Double): String =
    if (jarMin <= 0 || headMin < 0) "unadjudicated"
    else if (headMin <= jarMin * 1.10 + 0.05) "drift"
    else "code"
}
