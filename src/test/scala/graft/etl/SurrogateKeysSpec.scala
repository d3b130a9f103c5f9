package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SurrogateKeysSpec extends SparkTestBase {
  import spark.implicits._

  test("scalable id equals window id on the same ordering") {
    val df = spark.range(0, 10000).select(
      (col("id") * 2654435761L % 9973).as("k"),
      col("id").as("orig"))
    val windowed = SurrogateKeys.withWindowId(df, "sid", Seq(col("k"), col("orig")))
      .select("orig", "sid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scaled = SurrogateKeys.withScalableId(df, "sid", Seq(col("k"), col("orig")), numPartitions = 7)
      .select("orig", "sid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(windowed === scaled)
  }

  test("ids are dense 1..n") {
    val df = Seq("c", "a", "b").toDF("v")
    val out = SurrogateKeys.withScalableId(df, "id", Seq(col("v"))).collect()
      .map(r => r.getAs[String]("v") -> r.getAs[Long]("id")).toMap
    assert(out === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }
}
