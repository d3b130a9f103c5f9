package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly agg over AvailableNow equals the batch query") {
    val streamed = EventsStream.hourlyAgg(EventsStream.readEvents(spark, dir))
    // append-mode watermark holds back the tail window(s); compare the
    // common prefix against the batch twin
    val got = EventsStream.runAvailableNow(spark, streamed, "hourly_test")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = graft.queries.RelationalQueries.q13EventsHourly(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty, "stream emitted no closed windows")
    got.foreach { case (k, v) =>
      assert(batch.contains(k), s"stream window $k missing from batch")
      assert(batch(k) === v, s"window $k: stream=$v batch=${batch(k)}")
    }
  }

  test("streaming dedup keeps one row per content digest (== batch distinct)") {
    val streamed = EventsStream.dedupStream(EventsStream.readEvents(spark, dir))
    val got = EventsStream.runAvailableNow(spark, streamed, "dedup_test")
    val batchDistinct = graft.sources.Tables(spark, dir).events
      .select(md5(to_json(struct(col("user_id"), col("event_type"), col("value")))).as("h"))
      .distinct().count()
    assert(got.count() === batchDistinct,
      "stream dedup must emit exactly the batch-distinct digest count")
    val perHash = got.groupBy("content_hash").count()
      .where(col("count") > 1).count()
    assert(perHash === 0L, "no digest may survive twice")
  }

  test("stream-stream view->purchase join equals the batch time-bounded join") {
    val streamed = EventsStream.viewPurchaseJoin(EventsStream.readEvents(spark, dir))
    val got = EventsStream.runAvailableNow(spark, streamed, "vp_join_test")
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    val ev = graft.sources.Tables(spark, dir).events
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vt"), col("event_id").as("view_id"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("event_id").as("purchase_id"))
    val batch = v.join(p, col("vu") === col("pu") &&
        col("pt") >= col("vt") &&
        col("pt") <= col("vt") + expr("INTERVAL 1800 SECONDS"))
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "test data produced no view->purchase pairs")
    assert(got === batch,
      s"stream join mismatch: missing=${(batch -- got).size} extra=${(got -- batch).size}")
  }

  test("stream-static broadcast enrichment equals the batch left join") {
    val dim = graft.sources.Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"))
    val streamed = EventsStream.enrichWithDim(
        EventsStream.readEvents(spark, dir), dim, "user_id", "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
    val got = EventsStream.runAvailableNow(spark, streamed, "enrich_test")
      .as[(Long, String)].collect().toMap
    val batch = graft.sources.Tables(spark, dir).events
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().toMap
    assert(got.size === batch.size && got === batch)
  }

  test("stateful sessionization closes sessions on the 30-minute gap") {
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(minute * 60000L), user, "click", 1.0)
    // user 1: events at t=0,10 then a 60-min gap then t=70,75 → first session closes
    val events = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 70), ev(4, 1, 75), ev(5, 2, 0)).toDS()
    // batch Dataset → use the same state function through groupByKey on a
    // memory stream
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event]
    mem.addData(events.collect().toSeq: _*)
    val sessions = EventsStream.sessionize(mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess_test")
      .outputMode("append")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt-sess").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_test").as[EventsStream.SessionSummary].collect()
    // only user 1's FIRST session is closed (second stays open in state)
    assert(out.length === 1)
    assert(out(0).user_id === 1L && out(0).n_events === 2L && out(0).total_value === 2.0)
  }
}
