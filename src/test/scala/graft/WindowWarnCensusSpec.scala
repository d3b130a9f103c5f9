package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The runtime window census: installing it must count WindowExec's
  * "No Partition Defined" warning per execution while keeping it out of
  * the console appender, and partitioned windows must not count.
  */
class WindowWarnCensusSpec extends SparkTestBase {
  import spark.implicits._

  test("partition-less window executions are counted; partitioned ones are not") {
    val read = WindowWarnCensus.install()
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")

    val before = read()
    df.withColumn("r", row_number().over(Window.orderBy($"v")))
      .write.format("noop").mode("overwrite").save()
    val afterGlobal = read()
    assert(afterGlobal > before,
      "a partition-less WindowExec execution must increment the census")

    df.withColumn("r", row_number().over(Window.partitionBy($"k").orderBy($"v")))
      .write.format("noop").mode("overwrite").save()
    assert(read() === afterGlobal,
      "a partitioned window must not increment the census")
  }

  test("install is idempotent and keeps one shared counter") {
    val a = WindowWarnCensus.install()
    val b = WindowWarnCensus.install()
    assert(a() === b())
    (1 to 10).map(i => (i, i)).toDF("a", "b")
      .withColumn("r", rank().over(Window.orderBy($"b")))
      .write.format("noop").mode("overwrite").save()
    assert(a() === b(), "both readers must observe the same counter")
  }
}
