package graft.streaming

import graft.SparkTestBase
import graft.etl.{ManifestWarehouse, Scd2}
import org.apache.spark.sql.functions._

class Scd2StreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val seedRows = Seq(
    (1L, "GOLD", "NY"), (2L, "SILVER", "LA"), (3L, "GOLD", "SF"))
  private val batches = Seq(
    Seq((2L, "GOLD", "LA")),                     // change
    Seq((4L, "SILVER", "TX"), (1L, "GOLD", "NY")), // new key + no-op restatement
    Seq((2L, "PLAT", "LA")))                     // second change of the same key

  private def date(b: Long) = f"2026-02-${b + 1}%02d"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getDate(3)).map(_.toString).orNull,
      Option(r.getDate(4)).map(_.toString).orNull, r.getLong(5))).toSet

  test("3-batch CDC stream equals sequential Scd2 merges; history accumulates") {
    val wh = ManifestWarehouse(spark, tmp("scd2s"))
    Scd2Stream.seed(seedRows.toDF("k", "tier", "city"), wh, "dim",
      Seq("k"), Seq("tier", "city"), "2026-01-01")
    val streamDir = java.nio.file.Files.createTempDirectory("scd2-in")
    batches.zipWithIndex.foreach { case (rs, i) =>
      val out = tmp(s"scd2b$i") + "/out"
      rs.toDF("k", "tier", "city").coalesce(1).write.parquet(out)
      val part = new java.io.File(out).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    val stream = spark.readStream
      .schema(seedRows.toDF("k", "tier", "city").schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    Scd2Stream.mergeAvailableNow(stream, wh, "dim",
      Seq("k"), Seq("tier", "city"), date)

    val streamed = rows(wh.read("dim"))
    val sequential = batches.zipWithIndex.foldLeft(
        Scd2.initial(seedRows.toDF("k", "tier", "city"),
          Seq("k"), Seq("tier", "city"), "2026-01-01")) {
      case (cur, (rs, i)) =>
        Scd2.merge(cur, rs.toDF("k", "tier", "city"),
          Seq("k"), Seq("tier", "city"), date(i.toLong), closeMissing = false)
    }
    assert(streamed === rows(sequential))
    // key 2 carries its full three-version history
    assert(streamed.filter(_._1 == 2L) === Set(
      (2L, "SILVER", "LA", "2026-01-01", "2026-02-01", 0L),
      (2L, "GOLD", "LA", "2026-02-01", "2026-02-03", 0L),
      (2L, "PLAT", "LA", "2026-02-03", null, 1L)))
    // unmentioned keys never closed (CDC partial-feed semantics)
    assert(streamed.filter(_._1 == 3L) === Set((3L, "GOLD", "SF", "2026-01-01", null, 1L)))
  }

  test("a replayed batch at its original date is a content no-op") {
    val wh = ManifestWarehouse(spark, tmp("scd2r"))
    Scd2Stream.seed(seedRows.toDF("k", "tier", "city"), wh, "dim",
      Seq("k"), Seq("tier", "city"), "2026-01-01")
    val b0 = batches(0).toDF("k", "tier", "city")
    wh.write("dim", Scd2.merge(wh.read("dim"), b0, Seq("k"),
      Seq("tier", "city"), date(0), closeMissing = false))
    val first = rows(wh.read("dim"))
    // replay: same batch, same injected date — every row classifies
    // unchanged and the new generation is content-identical
    wh.write("dim", Scd2.merge(wh.read("dim"), b0, Seq("k"),
      Seq("tier", "city"), date(0), closeMissing = false))
    assert(rows(wh.read("dim")) === first)
  }
}
