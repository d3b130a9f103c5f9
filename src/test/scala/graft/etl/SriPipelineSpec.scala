package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden end-to-end test on the reference's real sample CSV
  * (read-only at /root/reference/csv_file/VEHICULOS_SRI.csv).
  * Expected cardinalities are the verified anchors from FIXTURES.md §1:
  * dim_tiempo=2192, dim_vehiculo=883 (882 distinct codes),
  * dim_transaccion=133 (4 distinct join-key pairs incl. one NAN-service),
  * dim_ubicacion=88, fact = 91,986 via the J2+J3 fan-outs (exact value
  * verified by replicating the reference's pandas merges directly on the
  * sample; SURVEY's ~91,726 estimate ignored the J2 vehicle fan-out).
  */
class SriPipelineSpec extends SparkTestBase {

  private val csv = "/root/reference/csv_file/VEHICULOS_SRI.csv"
  private lazy val out = java.nio.file.Files.createTempDirectory("graft-wh").toString
  private lazy val result = SriPipeline.run(
    spark, csv, ParquetWarehouse(spark, out),
    clock = java.time.LocalDate.of(2026, 1, 15), // outside dim_tiempo range → FK fill path
    minRecords = 1000L)

  test("dim_tiempo: 2192 daily rows with Spanish names") {
    assert(result.dimTiempo.count() === 2192L)
    val first = result.dimTiempo.orderBy("ID_Tiempo").limit(1).collect()(0)
    assert(first.getAs[Long]("ID_Tiempo") === 1L)
    assert(first.getAs[java.sql.Date]("FechaCompleta").toString === "2020-01-01")
    assert(first.getAs[String]("NombreMes") === "Enero")
    assert(first.getAs[String]("NombreDiaSemana") === "Miércoles") // 2020-01-01 was a Wednesday
    val years = result.dimTiempo.select(countDistinct("Anio")).collect()(0).getLong(0)
    assert(years === 6L)
  }

  test("dim_vehiculo: 883 rows, 882 distinct codes (raw-dedup-before-clean quirk)") {
    assert(result.dimVehiculo.count() === 883L)
    val codes = result.dimVehiculo.select(countDistinct("CodigoVehiculo")).collect()(0).getLong(0)
    assert(codes === 882L)
    // pandas astype(str) quirk: null MARCA → literal 'NAN'
    val nan = result.dimVehiculo.where(col("Marca") === "NAN").count()
    assert(nan === 1L)
    // ids are dense 1..n
    val stats = result.dimVehiculo.agg(min("ID_Vehiculo"), max("ID_Vehiculo"),
      countDistinct("ID_Vehiculo")).collect()(0)
    assert(stats.getLong(0) === 1L && stats.getLong(1) === 883L && stats.getLong(2) === 883L)
  }

  test("dim_transaccion: 133 rows, 3 distinct lookup-key pairs") {
    assert(result.dimTransaccion.count() === 133L)
    val pairs = result.dimTransaccion.select("TipoTransaccion", "TipoServicio")
      .distinct().count()
    assert(pairs === 4L) // 3 real pairs + (COMPRA LOCAL, NAN) from a null TIPO SERVICIO row
    val realPairs = result.dimTransaccion.select("TipoTransaccion", "TipoServicio")
      .where(col("TipoTransaccion") =!= "NAN" && col("TipoServicio") =!= "NAN")
      .distinct().count()
    assert(realPairs === 3L)
  }

  test("dim_ubicacion: 88 cantons, float-string codes, CANTON_ fallback everywhere") {
    assert(result.dimUbicacion.count() === 88L)
    // '10701.0'-style keys mean the hard-coded integer-keyed map never matches
    val dotted = result.dimUbicacion.where(col("CodigoCanton").endsWith(".0")).count()
    assert(dotted === 88L)
    val fallback = result.dimUbicacion.where(col("NombreCanton").startsWith("CANTON_")).count()
    assert(fallback === 88L)
  }

  test("fact: J3 fan-out multiplicity preserved; FK nulls filled with 1") {
    assert(result.fact.count() === 91986L)
    // date probe misses the real header → clock fallback (2026) → outside
    // dim_tiempo → every ID_Tiempo null-filled to 1
    val t = result.fact.select(countDistinct("ID_Tiempo")).collect()(0).getLong(0)
    assert(t === 1L)
    assert(result.fact.where(col("ID_Tiempo") === 1L).count() === 91986L)
    val nullCnt = result.fact.where(col("ID_Vehiculo").isNull || col("ID_Transaccion").isNull
      || col("ID_Ubicacion").isNull).count()
    assert(nullCnt === 0L)
  }

  test("validation report: thresholds enforced, integrity join computed") {
    val r = result.validation
    assert(r.factRows === 91986L)
    assert(r.factNullTiempo === 0L)
    assert(r.integrityJoinCount > 0L)
    assert(r.passed, s"violations: ${r.violations}")
  }

  test("strictLookup=true collapses the fan-out to one row per source record with a date") {
    val raw = SriPipeline.readCsv(spark, csv)
    val strict = FactRegistro.build(spark, raw,
      result.dimTiempo, result.dimVehiculo, result.dimTransaccion, result.dimUbicacion,
      clock = java.time.LocalDate.of(2026, 1, 15), strictLookup = true)
    // 1131 source rows; one duplicated vehicle code doubles 2 rows
    val n = strict.count()
    assert(n >= 1131L && n <= 1140L, s"got $n")
  }

  test("parallelDims=true produces the identical warehouse state") {
    val out2 = java.nio.file.Files.createTempDirectory("graft-wh-par").toString
    val r2 = SriPipeline.run(
      spark, csv, ParquetWarehouse(spark, out2),
      clock = java.time.LocalDate.of(2026, 1, 15),
      minRecords = 1000L, parallelDims = true)
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             name: String): Unit = {
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"$name contents differ")
      assert(a.count() === b.count(), s"$name cardinality differs") // except() is set-wise
    }
    same(r2.dimTiempo, result.dimTiempo, "dim_tiempo")
    same(r2.dimVehiculo, result.dimVehiculo, "dim_vehiculo")
    same(r2.dimTransaccion, result.dimTransaccion, "dim_transaccion")
    same(r2.dimUbicacion, result.dimUbicacion, "dim_ubicacion")
    same(r2.fact, result.fact, "fact")
  }

  test("metrics queries run and respect top-k") {
    val top = Metrics.topMarcas(result.fact, result.dimVehiculo).collect()
    assert(top.length === 10)
    assert(top(0).getAs[Long]("total_registros") >= top(9).getAs[Long]("total_registros"))
    val dash = Metrics.dashboard(result.fact, result.dimTiempo, result.dimVehiculo,
      result.dimUbicacion).collect()
    assert(dash.length === 10)
  }
}
