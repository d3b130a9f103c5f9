package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Source/sink matrix: the warehouse trait roundtrips tables through
  * parquet (primary), and the engine reads/writes CSV and JSON with
  * explicit schemas (S1/S2 generalization).
  */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-whspec").toString
  private lazy val df = Seq(
    (1L, "a", 1.5, java.sql.Date.valueOf("2024-01-01")),
    (2L, "b", -2.25, java.sql.Date.valueOf("2024-06-30")),
    (3L, null, 0.0, null)
  ).toDF("id", "s", "x", "d")

  test("Anio-partitioned fact prunes partitions for year-ranged queries") {
    val wh = ParquetWarehouse(spark, s"$tmp/whp",
      partitionCols = Map("fact" -> Seq("Anio")))
    val fact = spark.range(0, 1000).select(
      col("id").as("ID_Registro"),
      (col("id") % 5 + 2020).as("Anio"),
      (col("id") % 100).cast("double").as("MontoAvaluo"))
    wh.write("fact", fact)
    val q = wh.read("fact").where(col("Anio") === 2022)
    assert(q.count() === 200L)
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the year filter must reach the scan as a PARTITION filter (directory
    // pruning), not merely a data filter evaluated after reading all years
    assert(scans.contains("PartitionFilters"), s"no PartitionFilters in scan:\n$scans")
    val pf = scans.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("Anio"), s"Anio not in PartitionFilters: $pf")
    // and the scan must actually select 1 of the 5 year directories
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount === 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
  }

  test("parquet warehouse roundtrip preserves values and overwrite is idempotent") {
    val wh = ParquetWarehouse(spark, s"$tmp/wh")
    wh.write("t", df)
    wh.write("t", df) // truncate-and-reload
    val back = wh.read("t")
    assert(back.count() === 3L)
    // parquet reads everything nullable — compare names+types only
    assert(back.schema.map(f => (f.name, f.dataType)) === df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("partitioned write produces partition directories and prunes on read") {
    val wh = ParquetWarehouse(spark, s"$tmp/whp", partitionCols = Map("t" -> Seq("id")))
    wh.write("t", df)
    val dirs = new java.io.File(s"$tmp/whp/t").listFiles().map(_.getName).filter(_.startsWith("id="))
    assert(dirs.toSet === Set("id=1", "id=2", "id=3"))
    val pruned = wh.read("t").where(col("id") === 2L)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() === 1L)
    assert(scanned.contains("PartitionFilters") || scanned.contains("id=2"))
  }

  test("csv roundtrip with explicit schema") {
    df.drop("d").write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
    val back = spark.read.option("header", "true").schema(df.drop("d").schema).csv(s"$tmp/c")
    assert(back.collect().map(_.toSeq).toSet === df.drop("d").collect().map(_.toSeq).toSet)
  }

  test("orc roundtrip preserves values (built-in columnar alternative)") {
    df.write.mode("overwrite").orc(s"$tmp/o")
    val back = spark.read.orc(s"$tmp/o")
    assert(back.schema.map(f => (f.name, f.dataType)) === df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("json roundtrip with explicit schema") {
    df.write.mode("overwrite").json(s"$tmp/j")
    val back = spark.read.schema(df.schema).json(s"$tmp/j")
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }
}
