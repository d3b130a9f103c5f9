package graft.etl

import org.apache.spark.sql.SparkSession
import scala.concurrent.duration.{Duration, DurationInt}

/** Driver-side fan-out for independent Spark actions (job submission is
  * thread-safe): used to overlap the dim writes and the validation
  * profiles, whose wall time on small inputs is per-job latency, not
  * compute. One place to evolve error handling / timeouts for both.
  */
object Concurrency {

  /** Run `tasks` concurrently on a dedicated pool and return their results
    * in order. Bounded: a hung task fails the call after `timeout` instead
    * of stalling the pipeline forever. On the FIRST failure (or the
    * timeout), sibling SPARK JOBS are cancelled too when `spark` is given:
    * every task thread tags its jobs with a shared job group and the
    * failure path calls `cancelJobGroup` — interrupting the waiting thread
    * alone (`shutdownNow`) would abort the await while the submitted job
    * kept running and committed a partial warehouse write in the
    * background.
    */
  def inParallel[T](tasks: Seq[() => T], timeout: Duration = 30.minutes,
                    spark: Option[SparkSession] = None): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val group = s"graft-parallel-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(tasks.size, 16)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futures = tasks.map(t => Future {
      // job group is thread-local to the submitting thread — set it on
      // each worker so the cancel below reaches every sibling's jobs
      spark.foreach(_.sparkContext.setJobGroup(group,
        "graft parallel fan-out", interruptOnCancel = true))
      t()
    })
    try Await.result(Future.sequence(futures), timeout)
    catch {
      case e: Throwable =>
        spark.foreach(_.sparkContext.cancelJobGroup(group))
        throw e
    }
    finally pool.shutdownNow()
  }
}
