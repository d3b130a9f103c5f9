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
    * TrieMap: independent tables may be written concurrently
    * (SriPipeline's parallel dim fan-out).
    */
  private val writtenSchemas = scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

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

  /** Bucketed (and optionally sort-ordered) catalog table write: tables
    * bucketed the same way on their join key join with ZERO shuffle on
    * either side — the co-location strategy for fact⋈fact joins too big to
    * broadcast (BucketedJoinSpec asserts the exchange-free plan). Bucketing
    * requires the session catalog, hence saveAsTable; the files still land
    * under `root` via the path option.
    */
  def writeBucketed(name: String, df: DataFrame, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    writtenSchemas(name) = df.schema
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", s"$root/$name")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Catalog read for [[writeBucketed]] tables (bucket metadata lives in
    * the catalog, not the files — a plain parquet read would lose it).
    */
  def readTable(name: String): DataFrame = spark.table(name)
}
