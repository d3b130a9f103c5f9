package graft.etl

/** Pipeline configuration (S6 — the reference's config/variables.yaml:44-48
  * surface: data-quality thresholds and warehouse location). Loaded from
  * java.util.Properties (no external parser dependencies in the zero-egress
  * build); all keys optional with the reference's defaults.
  *
  * Keys: graft.warehouse.dir, graft.quality.maxNullPct,
  * graft.quality.minRecords, graft.etl.strictLookup
  */
final case class GraftConfig(
    warehouseDir: String = "spark-warehouse/graft",
    maxNullPct: Double = 10.0,    // ref variables.yaml:46 max_null_percentage
    minRecords: Long = 1000L,     // ref variables.yaml:47 min_records_threshold
    strictLookup: Boolean = false)

object GraftConfig {
  def fromProperties(props: java.util.Properties): GraftConfig = {
    def get(k: String): Option[String] = Option(props.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    // Name the offending key/value on parse failure — a bare
    // NumberFormatException from deep inside gives the operator nothing.
    def parse[A](k: String, v: String, f: String => A): A =
      try f(v) catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"bad value for $k: '$v' (${e.getMessage})", e)
      }
    GraftConfig(
      warehouseDir = get("graft.warehouse.dir").getOrElse(GraftConfig().warehouseDir),
      maxNullPct = get("graft.quality.maxNullPct")
        .map(v => parse("graft.quality.maxNullPct", v, _.toDouble)).getOrElse(GraftConfig().maxNullPct),
      minRecords = get("graft.quality.minRecords")
        .map(v => parse("graft.quality.minRecords", v, _.toLong)).getOrElse(GraftConfig().minRecords),
      strictLookup = get("graft.etl.strictLookup")
        .exists(v => parse("graft.etl.strictLookup", v, _.toBoolean)))
  }

  def load(path: String): GraftConfig = {
    val props = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try props.load(in) finally in.close()
    fromProperties(props)
  }
}
