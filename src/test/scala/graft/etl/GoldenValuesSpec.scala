package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-value pins beyond cardinalities: business-metric outputs on the
  * reference sample and calendar edge cases.
  */
class GoldenValuesSpec extends SparkTestBase {

  test("calendar covers both leap days and the year boundaries") {
    val dt = DimTiempo.build(spark).cache()
    val leap = dt.where(col("Mes") === 2 && col("Dia") === 29)
      .select("Anio").collect().map(_.getLong(0)).sorted
    assert(leap.toSeq === Seq(2020L, 2024L))
    val perYear = dt.groupBy("Anio").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perYear(2020L) === 366L && perYear(2021L) === 365L && perYear(2024L) === 366L)
    val last = dt.orderBy(col("ID_Tiempo").desc).limit(1).collect()(0)
    assert(last.getAs[java.sql.Date]("FechaCompleta").toString === "2025-12-31")
    assert(last.getAs[String]("NombreMes") === "Diciembre")
  }

  test("top-marcas exact values on the reference sample") {
    val out = java.nio.file.Files.createTempDirectory("graft-golden").toString
    val res = SriPipeline.run(spark, "/root/reference/csv_file/VEHICULOS_SRI.csv",
      ParquetWarehouse(spark, out), clock = java.time.LocalDate.of(2026, 1, 15))
    val top = Metrics.topMarcas(res.fact, res.dimVehiculo).collect()
      .map(r => (r.getAs[String]("Marca"), r.getAs[Long]("total_registros"),
        r.getAs[Double]("promedio_avaluo")))
    // observed + pinned from the verified 91,986-row fact
    assert(top(0) === (("SHINERAY", 27262L, 1240.07)))
    assert(top(1) === (("RANGER", 17888L, 1427.87)))
    assert(top(2) === (("SHM", 12472L, 2651.83)))
    val porAnio = Metrics.registrosPorAnio(res.fact, res.dimTiempo).collect()
    assert(porAnio.length === 1) // all FKs fall back to ID_Tiempo=1 → year 2020
    assert(porAnio(0).getAs[Long]("total_registros") === 91986L)
  }
}
