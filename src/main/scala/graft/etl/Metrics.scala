package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Business-metrics queries (ref dags/sri_vehiculos_etl_dag.py:762-844 +
  * notebook cell 15). Each returns a DataFrame; top-k queries carry a
  * deterministic tiebreaker the reference lacks (BigQuery LIMIT without one
  * is nondeterministic — SURVEY §7.4 #6). All dim joins broadcast.
  */
object Metrics {

  /** A6/O1 (ref :772-783): registrations + valuation by year, top 5 years.
    * Grouped on the CALENDAR year (the reference's semantics: ref :779
    * groups the dim's Anio) — the fact's own Anio partition column is the
    * raw event year and diverges on FK-fallback rows, so it is dropped
    * here rather than silently shadowing the dim's.
    */
  def registrosPorAnio(fact: DataFrame, dimTiempo: DataFrame): DataFrame =
    fact.drop("Anio").join(broadcast(dimTiempo), Seq("ID_Tiempo"))
      .groupBy(col("Anio"))
      .agg(
        count(lit(1)).as("total_registros"),
        round(sum(col("MontoAvaluo")), 2).as("monto_total_avaluo"),
        round(avg(col("MontoAvaluo")), 2).as("promedio_avaluo"))
      .orderBy(col("Anio").desc)
      .limit(5)

  /** A7/O2 (ref :788-798): top 10 brands by registrations. */
  def topMarcas(fact: DataFrame, dimVehiculo: DataFrame): DataFrame =
    fact.join(broadcast(dimVehiculo), Seq("ID_Vehiculo"))
      .groupBy(col("Marca"))
      .agg(
        count(lit(1)).as("total_registros"),
        round(avg(col("MontoAvaluo")), 2).as("promedio_avaluo"))
      .orderBy(col("total_registros").desc, col("Marca"))
      .limit(10)

  /** A8/O3 (ref :803-814): top 10 provinces. */
  def topProvincias(fact: DataFrame, dimUbicacion: DataFrame): DataFrame =
    fact.join(broadcast(dimUbicacion), Seq("ID_Ubicacion"))
      .groupBy(col("Provincia"), col("Region"))
      .agg(
        count(lit(1)).as("total_registros"),
        round(sum(col("MontoAvaluo")), 2).as("monto_total"))
      .orderBy(col("total_registros").desc, col("Provincia"), col("Region"))
      .limit(10)

  /** A9/O4 (notebook cell 15): top 10 (year, brand, province) combos. */
  def dashboard(fact: DataFrame, dimTiempo: DataFrame, dimVehiculo: DataFrame,
                dimUbicacion: DataFrame): DataFrame =
    fact.drop("Anio") // calendar Anio wins, as in registrosPorAnio
      .join(broadcast(dimTiempo), Seq("ID_Tiempo"))
      .join(broadcast(dimVehiculo), Seq("ID_Vehiculo"))
      .join(broadcast(dimUbicacion), Seq("ID_Ubicacion"))
      .groupBy(col("Anio"), col("Marca"), col("Provincia"))
      .agg(
        count(lit(1)).as("total_registros"),
        round(avg(col("MontoAvaluo")), 2).as("promedio_avaluo"))
      .orderBy(col("total_registros").desc, col("Anio"), col("Marca"), col("Provincia"))
      .limit(10)
}
