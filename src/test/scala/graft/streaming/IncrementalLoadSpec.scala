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

  test("equal-orderCol updates split across batches converge to one winner in any order") {
    // ADVICE r02: with the old `>=` guard the final state of an orderCol
    // tie depended on batch arrival order. The digest tie-break makes the
    // stored row the global min-digest row among max-orderCol rows,
    // whatever the batch grouping.
    val ts = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    def row(n: Long) = Seq((1L, ts, n)).toDF("user_id", "ts", "n")
    val digestOf = Seq(5L, 7L, 3L).map { n =>
      n -> row(n)
        .select(md5(to_json(struct(col("user_id"), col("ts"), col("n")))))
        .head.getString(0)
    }.toMap
    val winner = digestOf.minBy(_._2)._1
    def runOrder(order: Seq[Long]): Long = {
      val root = java.nio.file.Files.createTempDirectory("wh-tie").toString
      val wh = ParquetWarehouse(spark, root)
      wh.write("t", row(5L))
      order.foreach { n =>
        val dir = java.nio.file.Files.createTempDirectory(s"upd-$n").toString
        row(n).write.mode("overwrite").parquet(dir)
        val stream = spark.readStream.schema(row(n).schema).parquet(dir)
        IncrementalLoad.mergeAvailableNow(stream, wh, "t", Seq("user_id"), "ts")
      }
      wh.read("t").select("n").head.getLong(0)
    }
    assert(runOrder(Seq(7L, 3L)) === winner)
    assert(runOrder(Seq(3L, 7L)) === winner)
  }
}
