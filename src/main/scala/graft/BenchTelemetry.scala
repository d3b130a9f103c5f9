package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-metric counters for per-query bench telemetry —
  * VERDICT r13 item 6: wall-clock scaling factors certify TIME, not
  * HEADROOM; the 100× claim for the iterative families (LSA, PageRank/
  * HITS, PQ, suffix dedup) should rest on measured shuffle/spill growth,
  * not just a 5.6× total. Bench snapshots these around every query (after
  * draining the listener bus — events post asynchronously) and records
  * the deltas, so the sf0.1 sweep AND the sf1 rehearsal both carry
  * per-query shuffle bytes and spill with zero extra measurement runs.
  *
  * Peak task execution memory is a max, not a sum — Bench resets it per
  * query instead of delta-ing snapshots.
  */
final class BenchTelemetry extends SparkListener {
  val shuffleWriteBytes = new AtomicLong(0)
  val shuffleReadBytes = new AtomicLong(0)
  val diskSpillBytes = new AtomicLong(0)
  val memSpillBytes = new AtomicLong(0)
  val peakTaskMemBytes = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      diskSpillBytes.addAndGet(m.diskBytesSpilled)
      memSpillBytes.addAndGet(m.memoryBytesSpilled)
      peakTaskMemBytes.updateAndGet(v => math.max(v, m.peakExecutionMemory))
    }
  }

  final case class Snapshot(shuffleWrite: Long, shuffleRead: Long,
                            diskSpill: Long, memSpill: Long)

  def snapshot(): Snapshot = Snapshot(shuffleWriteBytes.get(),
    shuffleReadBytes.get(), diskSpillBytes.get(), memSpillBytes.get())

  def resetPeak(): Unit = peakTaskMemBytes.set(0)

  /** JSON object for one query: deltas of the cumulative counters plus
    * the per-query peak.
    */
  def deltaJson(before: Snapshot): String = {
    val after = snapshot()
    s"""{"shuffle_write_bytes":${after.shuffleWrite - before.shuffleWrite},""" +
      s""""shuffle_read_bytes":${after.shuffleRead - before.shuffleRead},""" +
      s""""disk_spill_bytes":${after.diskSpill - before.diskSpill},""" +
      s""""mem_spill_bytes":${after.memSpill - before.memSpill},""" +
      s""""peak_task_mem_bytes":${peakTaskMemBytes.get()}}"""
  }
}
