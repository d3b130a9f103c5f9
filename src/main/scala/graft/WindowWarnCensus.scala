package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.LoggerConfig

/** Runtime census of `WindowExec`'s "No Partition Defined" warning —
  * VERDICT r13 item 3: the bench tail carried 1,000+ copies of it from
  * AUDITED bounded-table sites, which meant a genuinely unbounded global
  * window introduced later would scroll by unnoticed.
  *
  * [[install]] registers a dedicated non-additive log4j2 logger config
  * for `WindowExec` whose ONLY appender counts the warning — so the tail
  * goes quiet AND every occurrence is still measured. `graft.Bench` reads
  * the counter around each query, records per-query counts in the bench
  * record, and reports any warning query that is not in
  * [[graft.queries.WindowAudits.boundedGlobalWindowByDesign]] under
  * `window_unaudited` — the alarm the noise was drowning. The plan-level
  * gate (`PlanInvariantSpec`'s window census) is unchanged; this covers
  * its blind spot (eager-by-construction queries never reach the plan
  * census) and covers execution-time re-plans (AQE).
  *
  * Log4j2 REPLACES its whole `Configuration` on reconfiguration — and
  * Spark triggers exactly that lazily (its `Logging` trait swaps in the
  * Spark default config on first use when log4j is still default-
  * configured), silently discarding any logger config added earlier. So
  * install() also registers a context listener that re-installs the
  * census into every future configuration; the counter itself lives in
  * this object and survives the swap.
  */
object WindowWarnCensus {

  private val WindowExecLogger = "org.apache.spark.sql.execution.window.WindowExec"
  private val AppenderName = "graft-window-census"
  private val counter = new AtomicLong(0)
  @volatile private var installed = false

  private lazy val appender: AbstractAppender = {
    val a = new AbstractAppender(AppenderName, null, null, true, null) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit =
        if (event.getMessage.getFormattedMessage.contains("No Partition Defined"))
          counter.incrementAndGet()
    }
    a.start()
    a
  }

  /** Idempotent. Returns a reader of the cumulative warning count. */
  def install(): () => Long = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      installInto(ctx)
      // survive configuration swaps (updateLoggers also fires this event;
      // installInto's already-installed check breaks the recursion)
      ctx.addPropertyChangeListener(new java.beans.PropertyChangeListener {
        override def propertyChange(e: java.beans.PropertyChangeEvent): Unit =
          if (e.getPropertyName == LoggerContext.PROPERTY_CONFIG)
            installInto(ctx)
      })
      installed = true
    }
    () => counter.get()
  }

  private def installInto(ctx: LoggerContext): Unit = {
    val cfg = ctx.getConfiguration
    val existing = cfg.getLoggerConfig(WindowExecLogger)
    val alreadyOurs = existing.getName == WindowExecLogger &&
      existing.getAppenders.containsKey(AppenderName)
    if (!alreadyOurs) {
      cfg.addAppender(appender)
      // non-additive: the warning stops propagating to the console
      // appender (noise gone) but still reaches the counter. Level stays
      // WARN so a future ERROR from WindowExec would still surface — the
      // config is replaced, not the class's ability to log.
      val lc = new LoggerConfig(WindowExecLogger, Level.WARN, false)
      lc.addAppender(appender, Level.WARN, null)
      cfg.removeLogger(WindowExecLogger)
      cfg.addLogger(WindowExecLogger, lc)
      ctx.updateLoggers()
    }
  }
}
