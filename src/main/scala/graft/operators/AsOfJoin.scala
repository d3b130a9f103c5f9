package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** AS-OF join — for each left row, the most recent right row with
  * `right.ts <= left.ts` sharing the key. Spark has no native operator;
  * rather than a custom SparkPlan, this composes built-ins (preference (a)
  * of the custom-operator ladder): tag and UNION both sides, then one
  * ignore-nulls `last()` window per right column.
  *
  * Scale properties: a single hash shuffle on the key (both sides
  * co-partitioned by construction), one local sort per partition, zero
  * range-explosion — the classic alternative (inequality join + groupBy
  * max) produces |left|×|right-per-key| intermediate rows; this produces
  * |left|+|right|. Skewed keys behave like any window partition (AQE can
  * split none — for pathological single-key skew, pre-salt by time bucket).
  */
object AsOfJoin {

  /** @param left      probe side (all rows preserved — "asof left join")
    * @param right     build side
    * @param key       equi-key column name (same name both sides)
    * @param ts        event-time column name (same name both sides)
    * @param rightCols right payload columns to carry; null when no right
    *                  row at-or-before the left timestamp exists
    */
  def asOfLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    require(rightCols.nonEmpty, "carry at least one right column")
    val l = left.withColumn("__side", lit(0))
    val r = right.select((key +: ts +: rightCols).map(col): _*)
      .withColumn("__side", lit(1))
    // allowMissingColumns fills the other side's columns with nulls
    val u = l.unionByName(r, allowMissingColumns = true)
    // At equal ts the right row must sort FIRST so the match is inclusive
    // (right.ts <= left.ts). Among right rows tied on (key, ts) the payload
    // columns break the tie deterministically (the last in payload order
    // wins) — without this the winner depends on partition layout.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: col("__side").desc +: rightCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(u) { (d, c) =>
      d.withColumn(c, last(when(col("__side") === 1, col(c)), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 0).drop("__side")
  }
}
