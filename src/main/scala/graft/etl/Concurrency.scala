package graft.etl

import scala.concurrent.duration.{Duration, DurationInt}

/** Driver-side fan-out for independent Spark actions (job submission is
  * thread-safe): used to overlap the dim writes and the validation
  * profiles, whose wall time on small inputs is per-job latency, not
  * compute. One place to evolve error handling / timeouts for both.
  */
object Concurrency {

  /** Run `tasks` concurrently on a dedicated pool and return their results
    * in order. Bounded: a hung task fails the call after `timeout` instead
    * of stalling the pipeline forever, and on the FIRST failure (or the
    * timeout) the pool is shut down with interrupts so sibling tasks do not
    * keep writing partial warehouse tables in the background.
    */
  def inParallel[T](tasks: Seq[() => T], timeout: Duration = 30.minutes): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(tasks.size, 16)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(tasks.map(t => Future(t()))), timeout)
    finally pool.shutdownNow() // interrupt any still-running siblings
  }
}
