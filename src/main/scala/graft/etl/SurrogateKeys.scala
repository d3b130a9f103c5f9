package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense sequential surrogate keys (1..n) — the reference's
  * `range(1, len(df)+1)` (ref dags/sri_vehiculos_etl_dag.py:70,161,245,534).
  *
  * pandas numbers rows in CSV file order, which no distributed engine can
  * reproduce cheaply; the engine instead DEFINES a canonical ordering
  * (caller-supplied sort columns) and documents the deviation (SURVEY §7.4
  * #3). All cross-table semantics survive because fact lookups join on
  * natural keys, never on the surrogate ids.
  */
object SurrogateKeys {

  /** Window-based id: simple, total-order correct — but a single-partition
    * sort. Use ONLY for dimension-sized tables (dims are small by
    * definition: ≤ thousands of rows).
    */
  def withWindowId(df: DataFrame, idName: String, order: Seq[Column]): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn(idName, row_number().over(w).cast("long"))
  }

  /** Scale path: dense ids over an arbitrarily large table without a global
    * single-partition sort. Three steps:
    *   1. range-repartition + intra-partition sort on the key (a true total
    *      order across partitions, each partition sorted locally);
    *   2. count rows per partition (one tiny job), prefix-sum on the driver
    *      (numPartitions values — trivially small);
    *   3. mapPartitions adds offset + local index.
    * Cost: one extra pass over the data; no 2 GB single-partition ceiling.
    */
  /** Incremental allocation for a warehouse dim that loads in rounds: keys
    * already in `existing` KEEP their ids (re-keying would break every fact
    * FK already written), and only natural keys new in `incoming` get fresh
    * ids, allocated densely from max(existing)+1 via the two-phase scalable
    * path. Returns the merged dim (`naturalKey` columns + `idName`).
    *
    * Id stability across loads holds whatever order new keys arrive in;
    * the ids of one round's NEW keys follow the canonical natural-key
    * ordering within that round (same contract as a fresh load's 1..n).
    */
  def withIncrementalId(existing: DataFrame, incoming: DataFrame, idName: String,
                        naturalKey: Seq[String], numPartitions: Int = 0): DataFrame = {
    val keyCols = naturalKey.map(col)
    val maxId = existing.agg(coalesce(max(col(idName)), lit(0L))).head.getLong(0)
    val inc = incoming.select(keyCols: _*).distinct()
    val exK = existing.select(keyCols: _*)
    // null-SAFE anti join: a plain equi-anti never matches a null key
    // (null = null is not true), which would classify a null natural key
    // as "new" on every load — one duplicate null row per round and a
    // different id each time, breaking the id-stability contract
    val cond = naturalKey.map(k => inc(k) <=> exK(k)).reduce(_ && _)
    val newKeys = inc.join(exK, cond, "left_anti")
    val keyed = withScalableId(newKeys, idName, keyCols, numPartitions)
      .withColumn(idName, col(idName) + maxId)
    existing.select(keyCols :+ col(idName): _*)
      .unionByName(keyed.select(keyCols :+ col(idName): _*))
  }

  def withScalableId(df: DataFrame, idName: String, order: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(1L)(_ + _) // ids start at 1
    val withId = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = offsets(i)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ n)
        n += 1
        r
      }
    }
    df.sparkSession.createDataFrame(withId,
      schema.add(idName, org.apache.spark.sql.types.LongType, nullable = false))
  }
}
