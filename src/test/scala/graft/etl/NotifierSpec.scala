package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Pins the D4 completion-notification payload (reference
  * `dags/sri_vehiculos_etl_dag.py:856-862` resumen fields): dag_id,
  * execution date, estado, duration, finish timestamp — all present in
  * the one logged line, deterministic given injected values.
  */
class NotifierSpec extends AnyFunSuite {

  private def summary(passed: Boolean) = RunSummary(
    dagId = "sri_vehiculos_etl_proceso",
    executionDate = java.time.LocalDate.of(2026, 1, 15),
    status = if (passed) "EXITOSO" else "FALLIDO",
    durationSecs = 12.3456,
    finishedAt = java.time.Instant.parse("2026-01-15T10:30:00Z"))

  test("LogNotifier emits every reference summary field in one line") {
    val lines = scala.collection.mutable.Buffer.empty[String]
    new LogNotifier(lines += _).notify(summary(passed = true))
    assert(lines.size === 1)
    val l = lines.head
    assert(l.contains("dag_id=sri_vehiculos_etl_proceso"))
    assert(l.contains("execution_date=2026-01-15"))
    assert(l.contains("status=EXITOSO"))
    assert(l.contains("duration=12.3s"))
    assert(l.contains("finished_at=2026-01-15T10:30:00Z"))
  }

  test("a failed run notifies estado FALLIDO, matching the reference's estados") {
    val lines = scala.collection.mutable.Buffer.empty[String]
    new LogNotifier(lines += _).notify(summary(passed = false))
    assert(lines.head.contains("status=FALLIDO"))
  }

  test("custom Notifier implementations receive the structured summary, not a string") {
    var got: Option[RunSummary] = None
    val webhookShaped: Notifier = s => got = Some(s)
    webhookShaped.notify(summary(passed = true))
    assert(got.exists(s => s.dagId == "sri_vehiculos_etl_proceso"
      && s.status == "EXITOSO" && s.durationSecs == 12.3456))
  }
}
