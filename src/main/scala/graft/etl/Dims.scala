package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three CSV-derived dimensions. Shared pattern
  * (ref dags/sri_vehiculos_etl_dag.py:146-194, :232-265, :290-373):
  * project → distinct → surrogate key → clean → rename → reorder.
  *
  * Semantics preserved exactly:
  *  - dedup runs on RAW values BEFORE cleaning (ref order :158 then
  *    :164-166), so rows differing only in whitespace/case stay distinct
  *    (the sample's 883-row dim_vehiculo with 882 distinct codes);
  *  - cleaning turns nulls into 'NAN' (pandas astype(str) artifact);
  *  - missing source columns are dropped defensively with a warning
  *    (P4, ref :153-155) rather than erroring;
  *  - surrogate ids are dense 1..n in canonical natural-key order
  *    (documented deviation from pandas file order, SURVEY §7.4 #3).
  */
object Dims {

  private def existing(df: DataFrame, wanted: Seq[String]): Seq[String] = {
    val present = wanted.filter(df.columns.contains)
    if (present.size != wanted.size) {
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"columns not found: ${wanted.diff(present).mkString(", ")}; using ${present.mkString(", ")}")
    }
    present
  }

  private def buildDim(
      raw: DataFrame,
      wanted: Seq[String],
      renames: Map[String, String],
      cleanCols: Seq[String],
      idName: String): DataFrame = {
    val cols = existing(raw, wanted)
    val deduped = raw.select(cols.map(col): _*).dropDuplicates()
    val keyed = SurrogateKeys.withWindowId(deduped, idName, cols.map(col))
    val cleaned = cleanCols.filter(cols.contains).foldLeft(keyed) { (d, c) =>
      d.withColumn(c, Cleaning.upperTrim(col(c)))
    }
    val renamed = renames.filter { case (k, _) => cols.contains(k) }
      .foldLeft(cleaned) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
    val order = idName +: cols.map(renames)
    renamed.select(order.map(col): _*)
  }

  /** dim_vehiculo (ref :146-194): distinct 12-col vehicle tuples.
    * COLOR 2 nulls → 'N/A' (ref :170) — note this fill happens AFTER the
    * clean loop in the reference, but COLOR 2 is not in the clean list, so
    * nulls are intact when fillna runs; replicated by filling before
    * renaming and never upper-trimming COLOR 2.
    */
  def vehiculo(raw: DataFrame): DataFrame = {
    val wanted = Seq("CÓDIGO DE VEHÍCULO", "MARCA", "MODELO", "PAÍS",
      "AÑO MODELO", "CLASE", "SUB CLASE", "TIPO",
      "CILINDRAJE", "TIPO COMBUSTIBLE", "COLOR 1", "COLOR 2")
    val renames = Map(
      "CÓDIGO DE VEHÍCULO" -> "CodigoVehiculo", "MARCA" -> "Marca",
      "MODELO" -> "Modelo", "PAÍS" -> "Pais", "AÑO MODELO" -> "AnioModelo",
      "CLASE" -> "Clase", "SUB CLASE" -> "SubClase", "TIPO" -> "Tipo",
      "CILINDRAJE" -> "Cilindraje", "TIPO COMBUSTIBLE" -> "TipoCombustible",
      "COLOR 1" -> "Color1", "COLOR 2" -> "Color2")
    val cleanCols = Seq("MARCA", "MODELO", "PAÍS", "CLASE", "SUB CLASE", "TIPO", "TIPO COMBUSTIBLE")
    val dim = buildDim(raw, wanted, renames, cleanCols, "ID_Vehiculo")
    if (dim.columns.contains("Color2")) dim.na.fill("N/A", Seq("Color2")) else dim
  }

  /** dim_transaccion (ref :232-265): distinct 4-col transaction tuples;
    * ALL four columns are cleaned (so the int64 CATEGORÍA upcast to string,
    * ref :250, falls out of upperTrim's cast).
    */
  def transaccion(raw: DataFrame): DataFrame = {
    val wanted = Seq("TIPO TRANSACCIÓN", "TIPO SERVICIO",
      "PERSONA NATURAL - JURÍDICA", "CATEGORÍA")
    val renames = Map(
      "TIPO TRANSACCIÓN" -> "TipoTransaccion", "TIPO SERVICIO" -> "TipoServicio",
      "PERSONA NATURAL - JURÍDICA" -> "PersonaTipo", "CATEGORÍA" -> "Categoria")
    buildDim(raw, wanted, renames, wanted, "ID_Transaccion")
  }

  /** Canton column probe, shared by the dim builder and the fact lookup
    * (FactRegistro J4) so a header accepted by one is accepted by both —
    * a divergence would build a populated dim_ubicacion while every fact
    * row silently fell back to ID_Ubicacion=1.
    */
  val CantonProbe: Seq[String] = Seq("CANTON", "CANTÓN", "canton", "cantón")

  /** Hard-coded canton → geography lookup (ref :303-321). Geographic data
    * carried over from the reference (17 Ecuadorian cantons); keys are
    * INTEGER-STRING codes like '10701' — which, against real data whose
    * CANTÓN column stringifies as '10701.0', NEVER match (ref quirk, SURVEY
    * §2.3 J4). Kept verbatim for behavioral fidelity.
    */
  val MapeoCantones: Map[String, (String, String, String)] = Map(
    "10701" -> (("CUENCA", "AZUAY", "SIERRA")),
    "10911" -> (("GIRON", "AZUAY", "SIERRA")),
    "10901" -> (("GUALACEO", "AZUAY", "SIERRA")),
    "10927" -> (("SANTA ISABEL", "AZUAY", "SIERRA")),
    "20606" -> (("PLAYAS", "GUAYAS", "COSTA")),
    "21101" -> (("GUAYAQUIL", "GUAYAS", "COSTA")),
    "21709" -> (("MILAGRO", "GUAYAS", "COSTA")),
    "31905" -> (("ZAMORA", "ZAMORA CHINCHIPE", "AMAZONIA")),
    "20501" -> (("QUITO", "PICHINCHA", "SIERRA")),
    "20505" -> (("CAYAMBE", "PICHINCHA", "SIERRA")),
    "30101" -> (("LAGO AGRIO", "SUCUMBIOS", "AMAZONIA")),
    "30201" -> (("GONZALO PIZARRO", "SUCUMBIOS", "AMAZONIA")),
    "30301" -> (("PUTUMAYO", "SUCUMBIOS", "AMAZONIA")),
    "30401" -> (("SHUSHUFINDI", "SUCUMBIOS", "AMAZONIA")),
    "30501" -> (("SUCUMBIOS", "SUCUMBIOS", "AMAZONIA")),
    "30601" -> (("CASCALES", "SUCUMBIOS", "AMAZONIA")),
    "30701" -> (("CUYABENO", "SUCUMBIOS", "AMAZONIA"))
  )

  /** dim_ubicacion (ref :290-373): distinct non-null canton codes from the
    * source, each either resolved through [[MapeoCantones]] or given the
    * CANTON_<code> / NO_IDENTIFICADA fallback row. The lookup map is tiny
    * and becomes three literal `element_at` probes (no join at all); ids
    * are dense in canonical (code) order.
    *
    * If the canton column is missing entirely, the reference emits a single
    * default '99999' NO_ESPECIFICADO row (ref :333-340) — replicated.
    */
  def ubicacion(raw: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cantonCol = Dims.CantonProbe.find(raw.columns.contains)
    cantonCol match {
      case None =>
        Seq((1L, "99999", "NO_ESPECIFICADO", "NO_ESPECIFICADA", "NO_ESPECIFICADA", "ECUADOR"))
          .toDF("ID_Ubicacion", "CodigoCanton", "NombreCanton", "Provincia", "Region", "Pais")
      case Some(c) =>
        val codes = raw.select(Cleaning.floatKeyToString(col(c)).as("CodigoCanton"))
          .where(col(c).isNotNull)
          .distinct()
        val keyed = SurrogateKeys.withWindowId(codes, "ID_Ubicacion", Seq(col("CodigoCanton")))
        val stripped = trim(col("CodigoCanton"))
        val nombre = typedlit(MapeoCantones.map { case (k, v) => k -> v._1 })
        val prov   = typedlit(MapeoCantones.map { case (k, v) => k -> v._2 })
        val region = typedlit(MapeoCantones.map { case (k, v) => k -> v._3 })
        keyed.select(
          col("ID_Ubicacion"),
          col("CodigoCanton"),
          coalesce(element_at(nombre, stripped), concat(lit("CANTON_"), stripped)).as("NombreCanton"),
          coalesce(element_at(prov, stripped), lit("NO_IDENTIFICADA")).as("Provincia"),
          coalesce(element_at(region, stripped), lit("NO_IDENTIFICADA")).as("Region"),
          lit("ECUADOR").as("Pais")
        )
    }
  }
}
