package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** JdbcWarehouse against embedded Derby — the remote-warehouse connector
  * path actually exercised: truncate-reload swap semantics, schema
  * round-trip through the JDBC dialect, parallel range reads, and the
  * full SRI pipeline golden counts through the connector.
  */
class JdbcWarehouseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString
  private lazy val wh =
    JdbcWarehouse(spark, s"jdbc:derby:$dbDir/wh;create=true")

  test("write/read round-trips rows and column types through the JDBC dialect") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score")
    wh.write("t_roundtrip", df)
    val back = wh.read("t_roundtrip").orderBy("id").collect()
    assert(back.length === 3)
    assert(back(0).getLong(0) === 1L && back(0).getString(1) === "alpha"
      && back(0).getDouble(2) === 1.5)
    assert(back(2).isNullAt(1))
  }

  test("second write is a full truncate-reload, not an append") {
    wh.write("t_reload", Seq((1L, "old"), (2L, "old")).toDF("id", "v"))
    wh.write("t_reload", Seq((10L, "new")).toDF("id", "v"))
    val rows = wh.read("t_reload").collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 10L)
  }

  test("the swap leaves no staging or retired tables behind") {
    wh.write("t_clean", Seq((1L, "a")).toDF("id", "v"))
    wh.write("t_clean", Seq((2L, "b")).toDF("id", "v"))
    val c = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/wh")
    try {
      def exists(n: String) = scala.util.Using.resource(
        c.getMetaData.getTables(null, null, n.toUpperCase, Array("TABLE")))(_.next())
      assert(exists("t_clean"))
      assert(!exists("t_clean__stage"), "staging table leaked")
      assert(!exists("t_clean__retire"), "retired table leaked")
    } finally c.close()
  }

  test("a failed load leaves the previous table fully live") {
    wh.write("t_atomic", Seq((1L, "live"), (2L, "live")).toDF("id", "v"))
    // a payload Derby cannot store: VARCHAR bound exceeded mid-load (the
    // dialect maps StringType to CLOB, so force failure via a duplicate
    // stage name being a VIEW the writer cannot drop)
    val c = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/wh")
    try {
      scala.util.Using.resource(c.createStatement())(
        _.executeUpdate("CREATE VIEW t_atomic__stage AS SELECT * FROM t_atomic"))
    } finally c.close()
    // the collision is detected up front with a clear message, not a
    // downstream opaque create-table failure
    val e = intercept[IllegalStateException] {
      wh.write("t_atomic", Seq((9L, "new")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("t_atomic__stage")
      && e.getMessage.contains("non-table"), e.getMessage)
    val rows = wh.read("t_atomic").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L),
      "failed load must leave the previous table intact")
    // clean the blocking view for later tests
    val c2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/wh")
    try scala.util.Using.resource(c2.createStatement())(
      _.executeUpdate("DROP VIEW t_atomic__stage"))
    finally c2.close()
  }

  test("metadata checks are scoped to the connection's current schema") {
    // a same-named TABLE and a same-named __stage VIEW in a DIFFERENT
    // schema must neither fake existence nor trip the collision abort —
    // the unqualified swap DDL resolves in the connection's current
    // schema only (ADVICE r13)
    val c = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/wh")
    try scala.util.Using.resource(c.createStatement()) { st =>
      st.executeUpdate("CREATE SCHEMA XOTHER")
      st.executeUpdate("CREATE TABLE XOTHER.T_XSCHEMA(id INT)")
      st.executeUpdate(
        "CREATE VIEW XOTHER.T_XSCHEMA__STAGE AS SELECT * FROM XOTHER.T_XSCHEMA")
    } finally c.close()
    wh.write("t_xschema", Seq((1L, "a")).toDF("id", "v"))
    wh.write("t_xschema", Seq((2L, "b")).toDF("id", "v"))
    assert(wh.read("t_xschema").collect().map(_.getLong(0)).toSeq === Seq(2L))
    // and the foreign-schema objects survive untouched
    val c2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/wh")
    try scala.util.Using.resource(
      c2.getMetaData.getTables(null, "XOTHER", "%", null)) { rs =>
      val names = Seq.newBuilder[String]
      while (rs.next()) names += rs.getString("TABLE_NAME")
      assert(names.result().toSet === Set("T_XSCHEMA", "T_XSCHEMA__STAGE"),
        "both XOTHER objects must still exist")
    } finally c2.close()
  }

  test("readPartitioned splits the scan and returns the same rows") {
    val df = spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
    wh.write("t_part", df)
    val par = wh.readPartitioned("t_part", "id", 0L, 1000L, 8)
    assert(par.rdd.getNumPartitions === 8)
    assert(par.count() === 1000L)
    assert(par.agg(sum("v")).head().getLong(0) === (0L until 1000L).map(_ * 2).sum)
  }

  test("the full SRI pipeline runs against the JDBC connector with golden counts") {
    val result = SriPipeline.run(
      spark, "/root/reference/csv_file/VEHICULOS_SRI.csv", wh,
      clock = java.time.LocalDate.of(2026, 1, 15), minRecords = 1000L)
    assert(result.dimTiempo.count() === 2192L)
    assert(result.fact.count() === 91986L)
    // and the warehouse readback (through JDBC) agrees with the result
    assert(wh.read("dim_tiempo").count() === 2192L)
    assert(wh.read("fact_registro_vehiculos").count() === 91986L)
  }
}
