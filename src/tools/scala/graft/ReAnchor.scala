package graft.tools

import java.nio.file.{Files, Paths}
import graft.BaselineJar

/** Two-jar drift re-anchor (VERDICT r14 item 7): rounds 11-14 adjudicated
  * every bench flag to drift/contention while the baseline record was
  * refreshed to the current round each time — so per-round comparisons
  * can never see CUMULATIVE creep. This tool runs the OLDEST runnable
  * pinned jar (r11, rebuilt from its sweep commit) head-to-head against a
  * freshly packaged HEAD jar on the shared query registry, both sides in
  * fresh child JVMs, ABBA-interleaved reps with per-query min-merge (the
  * tools.Adjudicate discipline), one session on one host — the cumulative
  * answer the per-round adjudications cannot give.
  *
  *   runMain graft.tools.ReAnchor <jarOld> <jarNew> <oldBenchRecord.json> [reps=2] [out=artifacts/r15/REANCHOR.json]
  *
  * The shared registry is (old record's query keys) ∩ (current
  * SparkEntry.queries): the old record is the committed BENCH_local of
  * the old jar's round, so the old child is never asked for a query its
  * registry lacks. Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_RUNS pass through to both children identically.
  */
object ReAnchor {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ReAnchor <jarOld> <jarNew> <oldBenchRecord.json> [reps=2] [outJson]")
    val jarOld = Paths.get(args(0)).toAbsolutePath.toString
    val jarNew = Paths.get(args(1)).toAbsolutePath.toString
    val oldRecord = args(2)
    val reps = if (args.length > 3) args(3).toInt else 2
    val out = Paths.get(if (args.length > 4) args(4) else "artifacts/r15/REANCHOR.json")
    Seq(jarOld, jarNew).foreach(j =>
      require(Files.exists(Paths.get(j)), s"missing jar: $j"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)

    val oldKeys: Set[String] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(Files.readString(Paths.get(oldRecord))) \ "queries" match {
        case JObject(fields) => fields.map(_._1).toSet
        case _ => sys.error(s"no queries object in $oldRecord")
      }
    }
    val shared = (oldKeys intersect graft.SparkEntry.queries.keySet).toSeq.sorted
    require(shared.nonEmpty, "no shared queries between the old record and HEAD")
    System.err.println(s"[reanchor] ${shared.size} shared queries " +
      s"(old registry ${oldKeys.size}, HEAD ${graft.SparkEntry.queries.size}); " +
      s"$reps reps x 2 sides x $runs runs at $sfDir")
    Option(out.getParent).foreach(Files.createDirectories(_))
    val logDir = out.getParent

    def minMerge(a: Map[String, Double], b: Map[String, Double]) =
      (a.keySet ++ b.keySet).map { k =>
        k -> math.min(a.getOrElse(k, Double.MaxValue), b.getOrElse(k, Double.MaxValue))
      }.toMap
    var oldM = Map.empty[String, Double]
    var newM = Map.empty[String, Double]
    (1 to reps).foreach { rep =>
      val sides: Seq[(String, () => Unit)] = Seq(
        "old" -> (() => { oldM = minMerge(oldM,
          BaselineJar.benchMinima(jarOld, sfDir, shared, runs, cpus, Some(logDir))) }),
        "new" -> (() => { newM = minMerge(newM,
          BaselineJar.benchMinima(jarNew, sfDir, shared, runs, cpus, Some(logDir))) }))
      val order = if (rep % 2 == 1) sides else sides.reverse
      order.foreach { case (side, run) =>
        System.err.println(s"[reanchor] rep $rep side $side starting")
        run()
      }
    }
    val rows = shared.flatMap { q =>
      for (o <- oldM.get(q); n <- newM.get(q)) yield (q, o, n,
        if (o > 0) n / o else -1.0)
    }
    val json = rows.map { case (q, o, n, r) =>
      "\"" + q + f"""":{"old_min":$o,"head_min":$n,"ratio":${r}%.4f}"""
    }.mkString("{", ",", "}")
    val risers = rows.filter { case (_, o, n, r) => r > 1.5 && n - o > 0.2 }
    val totalOld = rows.map(_._2).sum
    val totalNew = rows.map(_._3).sum
    val summary =
      s"""{"n_shared":${shared.size},"n_compared":${rows.size},"reps":$reps,"runs":$runs,"sf":"$sfDir","total_old_min":$totalOld,"total_head_min":$totalNew,"total_ratio":${if (totalOld > 0) totalNew / totalOld else -1},"risers_gt_1.5x":[${risers.map("\"" + _._1 + "\"").mkString(",")}],"queries":$json}"""
    Files.writeString(out, summary + "\n")
    println(s"[reanchor] wrote $out — total ratio ${if (totalOld > 0) f"${totalNew / totalOld}%.3f" else "n/a"}, risers: ${risers.size}")
  }
}
