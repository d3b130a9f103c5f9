package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the SRI vehicle-registry star schema.
  *
  * Input CSV columns follow the reference sample
  * (csv_file/VEHICULOS_SRI.csv, profiled in FIXTURES.md §1): accented
  * UTF-8 headers, numeric columns nullable → read as double (pandas parity:
  * int columns with any null infer float64). Output tables per SURVEY §1.4.
  */
object Schemas {

  /** Exact source headers (order as in the reference sample). */
  val csvSchema: StructType = StructType(Seq(
    StructField("CATEGORÍA", LongType),
    StructField("CÓDIGO DE VEHÍCULO", LongType),
    StructField("TIPO TRANSACCIÓN", StringType),
    StructField("MARCA", StringType),
    StructField("MODELO", StringType),
    StructField("PAÍS", StringType),
    StructField("AÑO MODELO", DoubleType),
    StructField("CLASE", StringType),
    StructField("SUB CLASE", StringType),
    StructField("TIPO", StringType),
    StructField("AVALÚO", DoubleType),
    StructField("FECHA PROCESO (DD/MM/AA)", StringType),
    StructField("TIPO SERVICIO", StringType),
    StructField("CILINDRAJE", DoubleType),
    StructField("TIPO COMBUSTIBLE", StringType),
    StructField("FECHA COMPRA (DD/MM/AA)", StringType),
    StructField("CANTÓN", DoubleType),
    StructField("COLOR 1", StringType),
    StructField("COLOR 2", StringType),
    StructField("PERSONA NATURAL - JURÍDICA", StringType)
  ))

  /** dim_tiempo output schema (ref dags/sri_vehiculos_etl_dag.py:101-110). */
  val dimTiempo: StructType = StructType(Seq(
    StructField("ID_Tiempo", LongType, nullable = false),
    StructField("FechaCompleta", DateType, nullable = false),
    StructField("Anio", LongType, nullable = false),
    StructField("Trimestre", LongType, nullable = false),
    StructField("Mes", LongType, nullable = false),
    StructField("Dia", LongType, nullable = false),
    StructField("NombreMes", StringType, nullable = false),
    StructField("NombreDiaSemana", StringType, nullable = false)
  ))
}
