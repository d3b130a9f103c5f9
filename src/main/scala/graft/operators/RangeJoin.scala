package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-range join: pair left rows with right rows sharing a key
  * whose timestamp falls in `[left.ts - windowSec, left.ts]`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin (O(|L|·|R|)
  * per key) — unusable at scale. The interval-bucket technique turns it
  * into an equi-join: bucket time by the window width, replicate the LEFT
  * side into its bucket and the preceding one (every right row at most
  * `windowSec` older is in one of those two buckets), equi-join on
  * (key, bucket), then apply the exact range predicate. Each true pair is
  * produced exactly once (a right row lives in exactly one bucket). Cost:
  * 2|L| + |R| shuffled rows and a hash join — no nested loop.
  */
object RangeJoin {

  /** Exact match PAIRS (inner semantics). For left-preserving analytics,
    * aggregate the pairs and left-join back (see
    * RelationalQueries.q37RangeJoin) — replicating unmatched left rows
    * through the bucket explode would duplicate them instead.
    *
    * @param leftTs  left timestamp column name
    * @param rightTs right timestamp column name (renamed to __rts in the
    *                output so equal names don't collide)
    * @param windowSec window size in seconds (inclusive bounds)
    */
  def timeWindowInner(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val r = right.withColumnRenamed(rightTs, "__rts")
    val lSec = col(leftTs).cast("double")
    val rSec = col("__rts").cast("double")
    val lExp = left.withColumn("__bucket",
      explode(array(floor(lSec / windowSec), floor(lSec / windowSec) - 1)))
    val rExp = r.withColumn("__bucket", floor(rSec / windowSec))
    lExp.join(rExp, Seq(key, "__bucket"))
      .where(rSec <= lSec && rSec >= lSec - windowSec)
      .drop("__bucket")
  }
}
