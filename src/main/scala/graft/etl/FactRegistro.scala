package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fact table builder (ref dags/sri_vehiculos_etl_dag.py:395-587): resolves
  * the four dimension FKs via left-join lookups and emits one row per
  * source record × lookup matches.
  *
  * Quirks preserved on purpose (SURVEY §7.4):
  *  - Date column probe list ['FECHA PROCESO','FECHA_PROCESO',
  *    'fecha_proceso','FECHA'] does NOT match the real header
  *    'FECHA PROCESO (DD/MM/AA)' → every row takes the `clock` fallback
  *    date (ref :447-463). A fixed clock is injected for testability; the
  *    probe logic itself is faithful.
  *  - J3 fan-out: the transaction lookup joins only (TipoTransaccion,
  *    TipoServicio) against a dim whose grain includes PersonaTipo and
  *    Categoria → 1,131 sample rows become 91,986 (measured; SURVEY §7.4 —
  *    the J3 fan-out compounded with the J2 vehicle-code dup). This is the
  *    reference's semantics; `strictLookup = true` opts into the "obvious
  *    fix" (dedup the dim on the join key first) but defaults OFF.
  *  - J4 key: fact-side CANTÓN stringifies as '10701.0' and matches the
  *    dim built from the same values.
  *  - Null FKs → 1, remaining nulls → 0 (ref :567-571).
  *
  * Physical: all four lookups are broadcast hash joins (dims are ≤ a few
  * thousand rows); the 100 TB fact side is never shuffled by the joins.
  */
object FactRegistro {

  def build(
      spark: SparkSession,
      raw: DataFrame,
      dimTiempo: DataFrame,
      dimVehiculo: DataFrame,
      dimTransaccion: DataFrame,
      dimUbicacion: DataFrame,
      clock: java.time.LocalDate = java.time.LocalDate.now(),
      strictLookup: Boolean = false): DataFrame = {

    // --- date resolution (ref :447-463) ---
    val dateProbe = Seq("FECHA PROCESO", "FECHA_PROCESO", "fecha_proceso", "FECHA")
      .find(raw.columns.contains)
    val dated = dateProbe match {
      case Some(c) =>
        raw.withColumn("FECHA_PROCESO_CONV", Cleaning.safeDate(col(c)))
          .where(col("FECHA_PROCESO_CONV").isNotNull) // dropna(subset=...) ref :456
          .withColumn("FECHA_PROCESO_DATE", to_date(col("FECHA_PROCESO_CONV")))
      case None =>
        raw.withColumn("FECHA_PROCESO_DATE", lit(clock.toString).cast("date"))
    }

    // --- J1: tiempo lookup (ref :469-474) ---
    val t = broadcast(dimTiempo.select(col("ID_Tiempo"), col("FechaCompleta")))
    val withT = dated.join(t, dated("FECHA_PROCESO_DATE") === t("FechaCompleta"), "left")

    // --- J2: vehiculo lookup (ref :478-489) ---
    val codigoProbe = Seq("CÓDIGO DE VEHÍCULO", "CODIGO_VEHICULO", "codigo_vehiculo")
      .find(raw.columns.contains)
    val withV = codigoProbe match {
      case Some(c) =>
        val v = broadcast(dimVehiculo.select(col("ID_Vehiculo"), col("CodigoVehiculo")))
        withT.join(v, withT(c) === v("CodigoVehiculo"), "left")
      case None => withT.withColumn("ID_Vehiculo", lit(1L))
    }

    // --- J3: transaccion lookup (ref :493-508) — the fan-out join ---
    val mergeCols = Seq(
      ("TIPO TRANSACCIÓN", "TipoTransaccion"),
      ("TIPO SERVICIO", "TipoServicio")
    ).filter { case (l, r) => raw.columns.contains(l) && dimTransaccion.columns.contains(r) }
    val withTr = if (mergeCols.nonEmpty) {
      val rightCols = col("ID_Transaccion") +: mergeCols.map { case (_, r) => col(r) }
      val dimSide0 = dimTransaccion.select(rightCols: _*)
      val dimSide = if (strictLookup) dimSide0.dropDuplicates(mergeCols.map(_._2)) else dimSide0
      val cond = mergeCols.map { case (l, r) => withV(l) === dimSide(r) }.reduce(_ && _)
      withV.join(broadcast(dimSide), cond, "left")
    } else withV.withColumn("ID_Transaccion", lit(1L))

    // --- J4: ubicacion lookup (ref :513-526) ---
    val cantonProbe = Dims.CantonProbe.find(raw.columns.contains)
    val withU = cantonProbe match {
      case Some(c) =>
        val u = broadcast(dimUbicacion.select(col("ID_Ubicacion"), col("CodigoCanton")))
        val key = Cleaning.floatKeyToString(withTr(c))
        withTr.join(u, key === u("CodigoCanton"), "left")
      case None => withTr.withColumn("ID_Ubicacion", lit(1L))
    }

    // --- metrics + final projection (ref :534-571) ---
    val avaluoProbe = Seq("AVALUO", "AVALÚO", "avaluo", "avalúo").find(raw.columns.contains)
    val withM = withU
      .withColumn("CantidadRegistros", lit(1L))
      .withColumn("MontoAvaluo",
        avaluoProbe.map(c => Cleaning.safeNumericFillZero(col(c))).getOrElse(lit(0.0)))

    // Surrogate id in canonical order (natural keys + resolved FKs); the
    // reference numbers pandas row order post-joins (ref :534).
    val orderCols = Seq("FECHA_PROCESO_DATE", "ID_Vehiculo", "ID_Transaccion", "ID_Ubicacion")
      .filter(withM.columns.contains).map(col) ++
      Seq(codigoProbe.map(col)).flatten
    val keyed = SurrogateKeys.withScalableId(withM, "ID_Registro", orderCols)

    // Anio: the year-grain partition column the reference's own config
    // intends (config/variables.yaml:19-20 declares year partitioning +
    // (Anio, Marca) clustering but never wires it). Derived from the
    // PARSED event date — rows whose date falls outside the calendar dim
    // keep their true year here even though the ID_Tiempo FK falls back
    // to 1, so physical pruning never lies about event time.
    val withAnio = keyed.withColumn("Anio", year(col("FECHA_PROCESO_DATE")).cast("long"))
    val factCols = Seq("ID_Registro", "ID_Tiempo", "ID_Vehiculo", "ID_Transaccion",
      "ID_Ubicacion", "Anio", "CantidadRegistros", "MontoAvaluo")
    val present = factCols.filter(withAnio.columns.contains)
    withAnio.select(present.map(col): _*)
      .na.fill(1L, Seq("ID_Tiempo", "ID_Vehiculo", "ID_Transaccion", "ID_Ubicacion").filter(present.contains))
      .na.fill(0)
  }
}
