package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** D2 — the per-task retry contract (ref dag.py:26-27: retries 2 @ 5 min),
  * asserted with an injectable sleeper (no wall-clock sleeps).
  */
class RetrySpec extends AnyFunSuite {

  test("a flaky task succeeds within the budget; the schedule is 2 sleeps of the delay") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Duration]
    val out = Retry.withRetries("flaky", Retry.Policy(retries = 2, delay = 5.minutes),
      sleeper = sleeps += _) {
      calls += 1
      if (calls < 3) sys.error(s"boom $calls")
      "ok"
    }
    assert(out === "ok" && calls === 3)
    assert(sleeps.toSeq === Seq(5.minutes, 5.minutes))
  }

  test("attempts exhausted: the LAST failure propagates, after exactly 1+retries attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries("doomed", Retry.Policy(retries = 2, delay = 0.seconds),
        sleeper = _ => ()) { calls += 1; sys.error(s"fail $calls") }
    }
    assert(calls === 3 && e.getMessage === "fail 3")
  }

  test("retries = 0 runs the task exactly once and fails fast") {
    var calls = 0
    intercept[RuntimeException] {
      Retry.withRetries("once", Retry.Policy(retries = 0), sleeper = _ => ()) {
        calls += 1; sys.error("no")
      }
    }
    assert(calls === 1)
  }

  test("fatal JVM errors are never retried") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withRetries("fatal", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1; throw new OutOfMemoryError("synthetic")
      }
    }
    assert(calls === 1, "a poisoned JVM must not re-run the task")
  }

  test("InterruptedException is never retried and the interrupt flag is restored") {
    var calls = 0
    Thread.interrupted() // clear any stale flag first
    intercept[InterruptedException] {
      Retry.withRetries("cancelled", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1; throw new InterruptedException("pool cancel")
      }
    }
    assert(calls === 1, "a cancelled task must stay cancelled — no 5-minute sleep-and-retry")
    assert(Thread.interrupted(), "the interrupt flag must be restored for the pool")
  }

  test("Spark job-cancellation exceptions are never retried, even wrapped") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries("spark-cancelled", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1
        throw new RuntimeException("stage failed",
          new org.apache.spark.SparkException(
            "Job 7 cancelled as part of cancellation of all jobs in group g1"))
      }
    }
    assert(calls === 1 && e.getMessage === "stage failed")
  }

  test("a structured SPARK_JOB_CANCELLED condition is never retried") {
    var calls = 0
    intercept[org.apache.spark.SparkException] {
      Retry.withRetries("structured-cancelled", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1
        throw new org.apache.spark.SparkException(
          "something went away", null, Some("SPARK_JOB_CANCELLED"),
          Map.empty[String, String], Array.empty[org.apache.spark.QueryContext])
      }
    }
    assert(calls === 1)
  }

  test("a structured NON-cancel condition whose message mentions 'cancel' keeps its retries") {
    // the message heuristic must only apply to exceptions WITHOUT a
    // structured condition — a genuine fault that merely mentions
    // cancellation in prose is retryable
    var calls = 0
    intercept[org.apache.spark.SparkException] {
      Retry.withRetries("prose-cancel", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1
        throw new org.apache.spark.SparkException(
          "task failed while peer was cancelled", null, Some("INTERNAL_ERROR"),
          Map.empty[String, String], Array.empty[org.apache.spark.QueryContext])
      }
    }
    assert(calls === 3, "2 retries + the original attempt")
  }

  test("an InterruptedException buried in the cause chain is treated as cancellation") {
    var calls = 0
    intercept[RuntimeException] {
      Retry.withRetries("wrapped-interrupt", Retry.Policy(retries = 2), sleeper = _ => ()) {
        calls += 1
        throw new RuntimeException("wrapper", new InterruptedException("interrupted"))
      }
    }
    assert(calls === 1)
  }

  test("onAttempt observes each failed attempt before its sleep") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var calls = 0
    Retry.withRetries("observed", Retry.Policy(retries = 2, delay = 1.second),
      sleeper = _ => (), onAttempt = (a, e) => seen += ((a, e.getMessage))) {
      calls += 1
      if (calls < 2) sys.error("first")
      ()
    }
    assert(seen.toSeq === Seq((1, "first")))
  }

  test("the pipeline retries a transiently-failing warehouse stage and completes (golden counts intact)") {
    val spark = graft.SparkTestBase.session
    val out = java.nio.file.Files.createTempDirectory("graft-retry-e2e").toString
    val inner = ParquetWarehouse(spark, out)
    // a warehouse whose FIRST fact write fails after the call lands —
    // the retried truncate-and-reload write must recover transparently
    var factAttempts = 0
    val flaky = new Warehouse {
      def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        if (name == "fact_registro_vehiculos") {
          factAttempts += 1
          if (factAttempts == 1) sys.error("transient warehouse outage")
        }
        inner.write(name, df)
      }
      def read(name: String): org.apache.spark.sql.DataFrame = inner.read(name)
    }
    val res = SriPipeline.run(spark, "/root/reference/csv_file/VEHICULOS_SRI.csv", flaky,
      clock = java.time.LocalDate.of(2026, 1, 15),
      retry = Retry.Policy(retries = 2, delay = 5.minutes), sleeper = _ => ())
    assert(factAttempts === 2, "exactly one retry")
    assert(res.fact.count() === 91986L, "golden fact count after the retried write")
  }
}
