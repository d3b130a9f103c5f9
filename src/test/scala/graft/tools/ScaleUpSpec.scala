package graft.tools

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The ×N rehearsal synthesizer must preserve referential structure
  * EXACTLY: every join's row count scales by the factor, key families
  * stay disjoint across replicas, and per-replica payload variation
  * (names, text) keeps the entity↔key bijection.
  */
class ScaleUpSpec extends SparkTestBase {
  import spark.implicits._

  test("FK joins scale exactly ×n even when the child table misses the parent's max key") {
    // order 30 has NO lineitems — the dangling-parent case where
    // per-table max offsets would silently desync the two join sides
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 100L), (10L, 200L), (20L, 100L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((100L, "a"), (200L, "b")).toDF("p_partkey", "p_name")
    val customer = Seq((1L, "x"), (2L, "y")).toDF("c_custkey", "c_x")

    val kOrder = ScaleUp.keySpan(orders, "o_orderkey")   // 31 — from ORDERS, not lineitem's 21
    val kPart = ScaleUp.keySpan(part, "p_partkey")
    val kCust = ScaleUp.keySpan(customer, "c_custkey")
    val n = 3
    val o2 = ScaleUp.replicate(orders, n, "o_orderkey" -> kOrder, "o_custkey" -> kCust).drop("__rep")
    val l2 = ScaleUp.replicate(lineitem, n, "l_orderkey" -> kOrder, "l_partkey" -> kPart).drop("__rep")
    val p2 = ScaleUp.replicate(part, n, "p_partkey" -> kPart).drop("__rep")
    val c2 = ScaleUp.replicate(customer, n, "c_custkey" -> kCust).drop("__rep")

    assert(o2.count() === orders.count() * n)
    assert(o2.select("o_orderkey").distinct().count() === orders.count() * n)
    assert(l2.join(o2, $"l_orderkey" === $"o_orderkey").count() === lineitem.count() * n)
    assert(l2.join(p2, $"l_partkey" === $"p_partkey").count() === lineitem.count() * n)
    assert(o2.join(c2, $"o_custkey" === $"c_custkey").count() === orders.count() * n)
    // replicas never collide: each replica's keys live in its own span block
    val blocks = o2.select((col("o_orderkey") / kOrder).cast("int").as("b"))
      .distinct().as[Int].collect().sorted
    assert(blocks.toSeq === Seq(0, 1, 2))
  }

  test("replica 0 is byte-identical and per-replica payloads keep the key bijection") {
    val customer = Seq((1L, "Customer#000000001"), (7L, "Customer#000000007"))
      .toDF("c_custkey", "c_name")
    val k = ScaleUp.keySpan(customer, "c_custkey")
    val scaled = ScaleUp.replicate(customer, 4, "c_custkey" -> k)
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
      .drop("__rep")
    // names are unique (the q123 fuzzy-join realism fix) and replica 0 unchanged
    assert(scaled.select("c_name").distinct().count() === scaled.count())
    val rep0 = scaled.where(col("c_custkey") < k).orderBy("c_custkey")
      .collect().map(_.getString(1)).toSeq
    assert(rep0 === Seq("Customer#000000001", "Customer#000000007"))
  }
}
