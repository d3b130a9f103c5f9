package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse abstraction (ref S2/S3: BigQuery WRITE_TRUNCATE load +
  * SELECT * readback, dags/sri_vehiculos_etl_dag.py:99-114, :421-434).
  *
  * The engine targets parquet tables behind this trait; a BigQuery-connector
  * implementation can be swapped in without touching pipeline semantics.
  * Truncate-and-reload == SaveMode.Overwrite (idempotent by construction,
  * matching the reference's daily full reprocess).
  */
trait Warehouse {
  def write(name: String, df: DataFrame): Unit
  def read(name: String): DataFrame
}

/** Parquet-directory warehouse. `partitionCols` lets large facts be written
  * partition-pruned (the reference's variables.yaml declares intended
  * partitioning on the date and clustering on (Anio, Marca) but never wires
  * it; here it is real).
  */
final case class ParquetWarehouse(
    spark: SparkSession,
    root: String,
    partitionCols: Map[String, Seq[String]] = Map.empty) extends Warehouse {

  /** Schemas as written, keyed by table — partitioned reads otherwise
    * re-infer partition-column types from directory names (long → int) and
    * move them to the end, silently breaking the declared star schema.
    */
  private val writtenSchemas = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  override def write(name: String, df: DataFrame): Unit = {
    writtenSchemas(name) = df.schema
    val w = df.write.mode(SaveMode.Overwrite)
    partitionCols.get(name) match {
      case Some(cols) if cols.forall(df.columns.contains) => w.partitionBy(cols: _*).parquet(s"$root/$name")
      case _ => w.parquet(s"$root/$name")
    }
  }

  override def read(name: String): DataFrame = {
    val raw = spark.read.parquet(s"$root/$name")
    writtenSchemas.get(name) match {
      case Some(schema) =>
        raw.select(schema.fields.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => raw
    }
  }
}
