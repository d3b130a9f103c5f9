package graft

import org.apache.spark.sql.SparkSession

/** Session ownership for CLI `main`s.
  *
  * `SparkSession.builder().getOrCreate()` JOINS an already-active session
  * when one exists in the JVM (it does NOT build a fresh one), so a `main`
  * that unconditionally calls `spark.stop()` kills its host's session —
  * e.g. a test JVM's shared session, or any application embedding the CLI
  * programmatically. Every graft entrypoint therefore acquires its session
  * through [[acquire]], which records whether the session pre-existed, and
  * releases it through [[release]], which stops ONLY a session the
  * entrypoint itself created.
  */
object Sessions {

  /** True iff some session is already live in this JVM (active on this
    * thread or registered as the JVM-wide default).
    */
  def sessionIsLive: Boolean =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .exists(s => !s.sparkContext.isStopped)

  /** Run `getOrCreate()` on `builder` and report ownership: returns
    * `(session, owned)` where `owned` is true iff no session was live
    * beforehand, i.e. the caller created this one and may stop it.
    */
  def acquire(builder: SparkSession.Builder): (SparkSession, Boolean) = {
    val preExisting = sessionIsLive
    (builder.getOrCreate(), !preExisting)
  }

  /** Stop `spark` iff `owned`. A joined (host-owned) session is left
    * running untouched.
    */
  def release(spark: SparkSession, owned: Boolean): Unit =
    if (owned) spark.stop()
}
