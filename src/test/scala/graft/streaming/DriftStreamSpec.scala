package graft.streaming

import graft.SparkTestBase
import graft.operators.Drift
import org.apache.spark.sql.functions._

class DriftStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeBatches(batches: Seq[Seq[Double]]): java.nio.file.Path = {
    val streamDir = java.nio.file.Files.createTempDirectory("drift-rows")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"db$i").toString + "/out"
      rows.toDF("x").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$streamDir/batch_$i.parquet"))
    }
    streamDir
  }

  test("the final streamed report is byte-identical to the one-shot batch measurement") {
    val baseline = (1 to 400).map(i => (i % 50).toDouble)
    // incoming batches drift progressively upward
    val batches = Seq(
      (1 to 100).map(i => (i % 50).toDouble),
      (1 to 100).map(i => (i % 50) + 5.0),
      (1 to 100).map(i => (i % 50) + 15.0))
    val streamDir = writeBatches(batches)
    val statePath = java.nio.file.Files.createTempDirectory("drift-state").toString + "/st"
    val reportPath = java.nio.file.Files.createTempDirectory("drift-rep").toString + "/rep"

    DriftStream.seedBaseline(baseline.toDF("x"), statePath, "x")
    val schema = batches.head.toDF("x").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    DriftStream.monitorAvailableNow(stream, statePath, reportPath, "x")

    // one report per batch
    val reports = spark.read.option("recursiveFileLookup", "true").parquet(reportPath)
      .collect().map(r => r.getAs[Long]("batch_id") -> r).toMap
    assert(reports.size == 3, s"expected 3 reports, got ${reports.keySet}")

    // batch-2 report == one-shot numericDrift(baseline, all three batches)
    val oneShot = Drift.numericDrift(
      baseline.toDF("x"), batches.flatten.toDF("x"), "x").head
    val last = reports(2L)
    Seq("n_base", "n_cur", "n_distinct").foreach(c =>
      assert(last.getAs[Long](c) == oneShot.getAs[Long](c), s"$c mismatch"))
    Seq("psi", "ks").foreach(c =>
      assert(last.getAs[Double](c) == oneShot.getAs[Double](c),
        s"$c: stream ${last.getAs[Double](c)} vs batch ${oneShot.getAs[Double](c)}"))

    // drift grows as the incoming snapshot shifts away from baseline
    assert(reports(0L).getAs[Double]("psi") < reports(2L).getAs[Double]("psi"),
      "accumulating shifted batches must raise PSI")
    assert(reports(0L).getAs[Double]("ks") <= reports(2L).getAs[Double]("ks"))
  }

  test("an unseeded state is refused loudly") {
    val streamDir = writeBatches(Seq(Seq(1.0, 2.0)))
    val schema = Seq(1.0).toDF("x").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val e = intercept[IllegalArgumentException] {
      DriftStream.monitorAvailableNow(stream,
        java.nio.file.Files.createTempDirectory("nostate").toString + "/missing",
        java.nio.file.Files.createTempDirectory("norep").toString + "/rep", "x")
    }
    assert(e.getMessage.contains("not seeded"))
  }
}
