package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
  * cases at runtime; explicit salting remains necessary when one join key
  * is so hot that even split partitions overwhelm a task, or when AQE is
  * unavailable (streaming joins). Pattern: replicate the build side
  * `factor`× with an explicit salt column, spread the probe side across
  * salts deterministically, join on (key, salt).
  *
  * Cost model: build side grows `factor`×, probe side is unchanged; the hot
  * key's rows land on `factor` different reducers instead of one.
  */
object Skew {

  /** Deterministic salt in [0, factor) derived from a row-identifying
    * column — reproducible across runs (no rand()).
    */
  def salt(idCol: Column, factor: Int): Column =
    pmod(xxhash64(idCol), lit(factor.toLong)).cast("int")

  /** Inner/left equi-join of a skewed probe side against a build side that
    * is too large to broadcast: `probe ⋈ build` on `key`, salted `factor`
    * ways. `probeIdCol` must identify probe rows (any well-distributed
    * column — the row id, a timestamp, etc.).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeIdCol: String, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    // Replicating the build side is only sound when unmatched build rows
    // never surface: "right"/"full"/"left_anti" would emit each unmatched
    // build row `factor` times (or drop probe rows that matched a replica).
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left only, got '$joinType'")
    val salted = probe.withColumn("__salt", salt(col(probeIdCol), factor))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
