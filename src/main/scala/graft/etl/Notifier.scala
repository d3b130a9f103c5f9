package graft.etl

/** Run-completion notification — the engine's D4 counterpart of the
  * reference's `notificar_finalizacion` (`dags/sri_vehiculos_etl_dag.py:845-880`):
  * the reference assembles a summary dict (dag_id, execution_date, estado,
  * duracion_total, timestamp_finalizacion) and LOGS it; the email/Slack
  * hooks in `config/variables.yaml:28-40` are commented-out stubs. The
  * engine mirrors that honestly — a trait carries the structured summary,
  * the shipped implementation logs it, and a real deployment plugs a
  * webhook/SMTP sender behind the same trait without touching the
  * pipeline.
  */
final case class RunSummary(
    dagId: String,
    executionDate: java.time.LocalDate,
    status: String, // the reference's estado values: EXITOSO / FALLIDO
    durationSecs: Double,
    finishedAt: java.time.Instant)

trait Notifier {
  def notify(summary: RunSummary): Unit
}

/** The reference's actual shipped behavior: log the summary fields.
  * The sink is injectable (the F10 injectable-dependency doctrine) so
  * specs can pin the exact payload without capturing stdout. The
  * duration formats under Locale.ROOT — the line is a machine-readable
  * payload, and a comma-decimal default locale must not change it.
  */
final class LogNotifier(sink: String => Unit = println) extends Notifier {
  override def notify(s: RunSummary): Unit =
    sink(s"[sri-etl] notify dag_id=${s.dagId} execution_date=${s.executionDate} " +
      s"status=${s.status} duration=" +
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(s.durationSecs)) +
      s"s finished_at=${s.finishedAt}")
}
