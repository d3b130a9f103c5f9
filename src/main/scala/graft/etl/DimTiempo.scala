package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar dimension generator (ref dags/sri_vehiculos_etl_dag.py:55-121):
  * one row per day 2020-01-01..2025-12-31 (2,192 rows), Spanish month and
  * weekday names.
  *
  * Spark-first: `sequence` + `explode` generates the rows distributed; the
  * surrogate key is `datediff` from the range start (identical to pandas'
  * positional numbering because the generator order IS date order) — no
  * window needed. Names are mapped from month()/isodow NUMBERS through
  * literal maps, reproducing the reference's meses_es/dias_es translation
  * (ref :81-95) while staying locale-independent (the reference's
  * strftime('%B') depends on process locale; mapping numbers does not —
  * SURVEY §7.4 #5).
  */
object DimTiempo {

  val MesesEs: Map[Int, String] = Map(
    1 -> "Enero", 2 -> "Febrero", 3 -> "Marzo", 4 -> "Abril",
    5 -> "Mayo", 6 -> "Junio", 7 -> "Julio", 8 -> "Agosto",
    9 -> "Septiembre", 10 -> "Octubre", 11 -> "Noviembre", 12 -> "Diciembre")

  /** isodow keyed: Monday=1 .. Sunday=7 (ref dias_es :88-92). */
  val DiasEs: Map[Int, String] = Map(
    1 -> "Lunes", 2 -> "Martes", 3 -> "Miércoles", 4 -> "Jueves",
    5 -> "Viernes", 6 -> "Sábado", 7 -> "Domingo")

  def build(spark: SparkSession,
            start: String = "2020-01-01",
            end: String = "2025-12-31"): DataFrame = {
    val d = col("FechaCompleta")
    val isodow = (dayofweek(d) + lit(5)) % 7 + 1
    spark.sql(s"SELECT explode(sequence(DATE'$start', DATE'$end', interval 1 day)) AS FechaCompleta")
      .select(
        (datediff(d, lit(start).cast("date")) + 1).cast("long").as("ID_Tiempo"),
        d,
        year(d).cast("long").as("Anio"),
        quarter(d).cast("long").as("Trimestre"),
        month(d).cast("long").as("Mes"),
        dayofmonth(d).cast("long").as("Dia"),
        element_at(typedlit(MesesEs), month(d)).as("NombreMes"),
        element_at(typedlit(DiasEs), isodow).as("NombreDiaSemana")
      )
  }
}
