package graft.etl

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Remote-warehouse connector behind the [[Warehouse]] trait — the shape
  * the reference's BigQuery `WRITE_TRUNCATE` load occupies
  * (`dags/sri_vehiculos_etl_dag.py:99-114`, `:577-580`), implemented over
  * Spark's JDBC source so the semantics are EXERCISED, not emulated: the
  * test suite runs the full SRI pipeline against an embedded Derby
  * database through this class (the sandbox has no network, but the JDBC
  * protocol path — dialect mapping, batched writes, swap DDL — is the
  * same one a Postgres/warehouse endpoint would take; only the URL
  * changes).
  *
  * Truncate-reload is implemented the way production connectors do it,
  * NOT as `SaveMode.Overwrite` straight onto the live table:
  *
  *   1. the new data loads into a staging table (`<name>__stage`) —
  *      per-partition parallel batched INSERTs, the live table untouched;
  *   2. the live table swaps to `<name>__retire` and the staging table to
  *      the live name in ONE transaction (Derby DDL is transactional; on
  *      engines without transactional DDL this step is the documented
  *      atomicity boundary — exactly the BigQuery WRITE_TRUNCATE
  *      contract this class mirrors);
  *   3. the retired table drops only after the swap commits.
  *
  * A failed load therefore leaves the previous table fully live (the
  * [[ManifestWarehouse]] generation-flip guarantee, spoken in DDL), and a
  * reader never observes a half-truncated table — which plain
  * `option("truncate", true)` cannot promise.
  *
  * Scale shape: writes parallelize per input partition (one JDBC batch
  * stream each); [[readPartitioned]] exposes the connector's parallel
  * scan lever (predicate-split range reads). `read` returns a single-
  * partition scan — fine for dims, wrong for facts; the pipeline reads
  * dims back, so the default is the dim shape.
  */
final case class JdbcWarehouse(
    spark: SparkSession,
    url: String,
    connectionProps: Map[String, String] = Map.empty) extends Warehouse {

  private def props: Properties = {
    val p = new Properties()
    connectionProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private def withConnection[T](f: Connection => T): T = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  /** JDBC identifiers are folded to upper case by Derby (and most
    * warehouses) when unquoted; Spark's JDBC writer emits unquoted names,
    * so existence checks must match that folding. The metadata lookup's
    * name argument is a LIKE pattern where '_' is a single-char wildcard
    * — and every stage/retire name contains '__' — so results are
    * re-filtered by EXACT name and fully scanned, never trusted from the
    * pattern match (a wildcard hit on some OTHER object would otherwise
    * fake existence, and type rows sort TABLE-first so a one-row peek
    * could hide a squatting view).
    */
  private def objectTypes(c: Connection, name: String): Seq[String] = {
    val target = name.toUpperCase
    // Scope to the connection's CURRENT schema: the stage/retire DDL runs
    // unqualified, so it resolves there — a same-named table/view in ANY
    // other schema (user or system) must neither fake existence for
    // tableExists nor trip failOnNonTableCollision (ADVICE r13). getSchema
    // may be null (driver without a current-schema notion); then the
    // unqualified-DDL target is genuinely ambiguous and the unfiltered
    // scan is the conservative read. The schema is applied as an EXACT
    // row filter, never as the metadata schemaPattern — same LIKE-wildcard
    // ('_' in "MY_SCHEMA") reason the name is re-filtered below.
    val schema = Option(c.getSchema)
    scala.util.Using.resource(
      c.getMetaData.getTables(null, null, target, null)) { rs =>
      val types = Seq.newBuilder[String]
      while (rs.next())
        if (rs.getString("TABLE_NAME") == target &&
            schema.forall(_ == rs.getString("TABLE_SCHEM")))
          types += rs.getString("TABLE_TYPE")
      types.result()
    }
  }

  private def tableExists(c: Connection, name: String): Boolean =
    objectTypes(c, name).contains("TABLE")

  private def dropIfExists(c: Connection, name: String): Unit =
    if (tableExists(c, name))
      scala.util.Using.resource(c.createStatement())(_.executeUpdate(s"DROP TABLE $name"))

  /** A VIEW (or synonym, alias, …) squatting on a name we must own would
    * make every subsequent write fail with an opaque create-table error —
    * `dropIfExists` only clears TABLEs on purpose (dropping a user's view
    * silently would be worse). Detect the collision and say so.
    */
  private def failOnNonTableCollision(c: Connection, name: String): Unit =
    objectTypes(c, name).find(_ != "TABLE").foreach { t =>
      throw new IllegalStateException(
        s"JdbcWarehouse needs '$name' for its truncate-reload swap, but a " +
          s"non-table object of type $t already holds that name; drop or " +
          "rename it (JdbcWarehouse will not drop non-TABLE objects)")
    }

  override def write(name: String, df: DataFrame): Unit = {
    val stage = s"${name}__stage"
    val retire = s"${name}__retire"
    // a previous crashed run may have left stage/retire behind — both are
    // dead by construction (never the live name), safe to clear; anything
    // that is NOT a plain table on these names is a collision we must
    // surface, not silently fail on at create-table time
    withConnection { c =>
      failOnNonTableCollision(c, stage)
      failOnNonTableCollision(c, retire)
      dropIfExists(c, stage); dropIfExists(c, retire)
    }
    df.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
    withConnection { c =>
      c.setAutoCommit(false)
      try {
        scala.util.Using.resource(c.createStatement()) { st =>
          if (tableExists(c, name))
            st.executeUpdate(s"RENAME TABLE $name TO $retire")
          st.executeUpdate(s"RENAME TABLE $stage TO $name")
        }
        c.commit()
      } catch {
        case e: Throwable => c.rollback(); throw e
      }
      c.setAutoCommit(true)
      dropIfExists(c, retire)
    }
  }

  override def read(name: String): DataFrame =
    spark.read.jdbc(url, name, props)

  /** Parallel range-partitioned read — the connector scale lever for
    * tables too big for one scan connection: `n` concurrent readers, each
    * fetching `[lower + i·stride, …)` of `partCol`.
    */
  def readPartitioned(name: String, partCol: String,
                      lower: Long, upper: Long, n: Int): DataFrame =
    spark.read.jdbc(url, name, partCol, lower, upper, n, props)
}
