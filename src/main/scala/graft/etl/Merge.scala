package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert — the incremental-load upgrade path for the reference's
  * truncate-and-reload warehouse (S2, dags/sri_vehiculos_etl_dag.py:99-114
  * reloads every table daily). At 100 TB a daily full rewrite is not an
  * option; the standard pattern is MERGE of a (small) change batch into the
  * (huge) base table.
  */
object Merge {

  /** Upsert `updates` into `base` matched on `keyCols`: matched rows take
    * every column from `updates` (including nulls — an update row owns its
    * full record, as in SQL MERGE ... UPDATE SET *), unmatched update rows
    * are inserted, unmatched base rows pass through. Both inputs must share
    * `base`'s schema; output preserves it.
    *
    * SQL-MERGE parity caveats:
    *   - the join uses plain equality, so a null key never matches (a
    *     null-key update row INSERTS, exactly as `ON b.k = u.k` behaves);
    *   - `updates` must hold at most one row per key — SQL MERGE raises on
    *     multiple matches, and a distributed engine can only detect that
    *     with an extra aggregation. Pass `checkDuplicateKeys = true` to pay
    *     that one map-side-combinable count and fail fast instead of
    *     silently fanning matched base rows out.
    *
    * Physical shape: ONE full-outer shuffle join on the key. The base side
    * shuffles at most once; if the base table is bucketed on the key
    * ([[ParquetWarehouse.writeBucketed]]) even that exchange disappears and
    * only the small update batch moves. Update-side presence is detected
    * with a non-null marker column, not null-checking the key (a null join
    * key in `updates` must insert, not corrupt a match).
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
             checkDuplicateKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"updates schema ${updates.columns.toSeq} must match base schema $cols")
    if (checkDuplicateKeys) {
      val dups = updates.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(5)
        .collect()
      require(dups.isEmpty,
        s"updates has multiple rows per key (first offenders: ${dups.mkString(", ")})")
    }
    val u = updates.withColumn("__present", lit(1))
    val joined = base.alias("b").join(
      u.alias("u"),
      keyCols.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _),
      "full_outer")
    joined.select(cols.map { c =>
      when(col("u.__present").isNotNull, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }: _*)
  }
}
