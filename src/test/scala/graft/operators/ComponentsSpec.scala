package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents labels every node with its component min") {
    // two components: {1,2,3,4} chained, {10,11} — plus a cross-band bridge
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges (diameter iterations) and min propagates end to end") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("edge direction and duplicates do not change the result") {
    val a = Seq((5L, 9L), (9L, 5L), (5L, 9L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(a, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
  }

  test("dedupClusters counts members per component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Components.dedupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 10L -> 2L))
  }

  test("maxIter too small fails loudly instead of returning a partial fixpoint") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "id_a", "id_b", maxIter = 2)
    }
  }
}
