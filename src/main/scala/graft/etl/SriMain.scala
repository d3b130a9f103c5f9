package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry for the SRI ETL — the engine's equivalent of the reference's
  * DAG run (dags/sri_vehiculos_etl_dag.py:913-922 sequencing + the :846-877
  * run-completion audit record): build dims + fact into a parquet
  * warehouse, validate, print metrics and a job summary.
  *
  * Usage: runMain graft.etl.SriMain <csvPath> <warehouseDir> [fixedDate]
  *
  * GRAFT_WAREHOUSE=manifest selects the object-store layout
  * ([[ManifestWarehouse]]: generation prefixes + atomic manifest commit,
  * the WRITE_TRUNCATE-equivalent for stores without atomic directory
  * rename); default is the plain overwrite-in-place [[ParquetWarehouse]].
  */
object SriMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SriMain <csvPath> <warehouseDir> [fixedDate yyyy-MM-dd]")
    val Array(csvPath, whDir) = args.take(2)
    val clock = if (args.length > 2) java.time.LocalDate.parse(args(2)) else java.time.LocalDate.now()
    val started = System.nanoTime()

    // Only stop a session this main created — getOrCreate joins a host
    // JVM's live session and stopping that would kill the host's work.
    val (spark, owned) = graft.Sessions.acquire(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("sri-vehiculos-etl")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")

    // fact partitioned by Anio — the year grain the reference's own config
    // declares (config/variables.yaml:19-20) and the right granularity at
    // scale: daily-grain ID_Tiempo partitioning would mean 2,192 partitions
    // and a small-files problem at 100 TB; year partitions prune
    // date-ranged queries while keeping partition count bounded.
    val partCols = Map("fact_registro_vehiculos" -> Seq("Anio"))
    val wh: Warehouse = sys.env.get("GRAFT_WAREHOUSE") match {
      case Some("manifest") => ManifestWarehouse(spark, whDir, partCols)
      case Some(other) if other != "parquet" =>
        sys.error(s"GRAFT_WAREHOUSE must be 'parquet' or 'manifest', got '$other'")
      case _ => ParquetWarehouse(spark, whDir, partCols)
    }
    val pipelineStart = System.nanoTime()
    // D2: the reference's declared per-task policy (dag.py:26-27 —
    // retries 2, delay 5 min) applies at the orchestrated entry point
    val res = SriPipeline.run(spark, csvPath, wh, clock, parallelDims = true,
      retry = Retry.Policy(retries = 2,
        delay = scala.concurrent.duration.DurationInt(5).minutes))
    val pipelineSecs = (System.nanoTime() - pipelineStart) / 1e9
    println(f"[sri-etl] pipeline=$pipelineSecs%.1fs (excl. session startup)")

    println(s"[sri-etl] dim_tiempo=${res.dimTiempo.count()} dim_vehiculo=${res.dimVehiculo.count()} " +
      s"dim_transaccion=${res.dimTransaccion.count()} dim_ubicacion=${res.dimUbicacion.count()} " +
      s"fact=${res.validation.factRows}")
    println(s"[sri-etl] validation passed=${res.validation.passed} " +
      s"integrityJoin=${res.validation.integrityJoinCount} violations=${res.validation.violations.mkString("; ")}")

    println("[sri-etl] top marcas:")
    Metrics.topMarcas(res.fact, res.dimVehiculo).collect()
      .foreach(r => println(s"  ${r.mkString(" | ")}"))
    println("[sri-etl] registros por anio:")
    Metrics.registrosPorAnio(res.fact, res.dimTiempo).collect()
      .foreach(r => println(s"  ${r.mkString(" | ")}"))

    val secs = (System.nanoTime() - started) / 1e9
    println(f"[sri-etl] status=${if (res.validation.passed) "SUCCESS" else "FAILED"} duration=$secs%.1fs")
    // D4 completion notification (reference dag.py:845-880): the shipped
    // implementation logs the structured summary, like the reference does
    new LogNotifier().notify(RunSummary(
      dagId = "sri_vehiculos_etl_proceso",
      executionDate = clock,
      status = if (res.validation.passed) "EXITOSO" else "FALLIDO",
      durationSecs = secs,
      finishedAt = java.time.Instant.now()))
    graft.Sessions.release(spark, owned)
    // sys.exit would tear down a host JVM (e.g. a test runner); only a
    // standalone CLI run — one that owned its session — may exit.
    if (!res.validation.passed && owned) sys.exit(1)
  }
}
