package graft.etl

/** Driver-side fan-out for independent Spark actions (job submission is
  * thread-safe): used to overlap the dim writes and the validation
  * profiles, whose wall time on small inputs is per-job latency, not
  * compute. One place to evolve error handling / timeouts for both.
  */
object Concurrency {
  def inParallel[T](tasks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(tasks.map(t => Future(t()))), Duration.Inf)
  }
}
