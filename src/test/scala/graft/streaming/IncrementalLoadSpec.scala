package graft.streaming

import graft.SparkTestBase
import graft.etl.ParquetWarehouse
import org.apache.spark.sql.functions._

class IncrementalLoadSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed foreachBatch MERGE ends in the same state as a batch merge") {
    val root = java.nio.file.Files.createTempDirectory("wh-inc").toString
    val wh = ParquetWarehouse(spark, root)
    // base: one summary row per user for an initial slice of events
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val base = events.where(col("event_id") < 300)
      .groupBy(col("user_id")).agg(max(col("ts")).as("ts"), count(lit(1)).as("n"))
    wh.write("user_state", base)

    // updates: the raw stream projected to the merge schema — many rows per
    // user land in the one AvailableNow batch, exercising the per-key
    // collapse (latest ts wins) before the MERGE
    val raw = EventsStream.readEvents(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), lit(1L).as("n"))
    IncrementalLoad.mergeAvailableNow(raw, wh, "user_state", Seq("user_id"), "ts")

    val got = wh.read("user_state")
      .select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .collect().toMap
    // expected: every user present in events has its LATEST event ts; users
    // only in base keep their base ts
    val latest = events.groupBy(col("user_id")).agg(max(col("ts")).as("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val baseM = base.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val want = baseM ++ latest // stream covers all events, so latest wins
    assert(got == want, s"mismatch: got=${got.size} want=${want.size}")

    // full replay from a fresh checkpoint: every update is now stale-or-
    // equal vs the stored rows, so the recency guard makes it a no-op
    IncrementalLoad.mergeAvailableNow(raw, wh, "user_state", Seq("user_id"), "ts")
    val afterReplay = wh.read("user_state")
      .select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .collect().toMap
    assert(afterReplay == want, "replaying the full stream must not change the table")
  }
}
