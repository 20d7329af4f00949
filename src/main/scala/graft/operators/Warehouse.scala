package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensional-warehouse maintenance operators — the slowly-changing-
  * dimension counterpart of the reference's dimension handling (its zone
  * lookup is a static dim, reference README.md:20; a production warehouse
  * versions it). New scope beyond the reference.
  */
object Warehouse {

  /** SCD Type-2 merge: apply an update batch to a versioned dimension.
    *
    * `dim` rows carry (key, tracked attributes, valid_from, valid_to,
    * is_current); `updates` carries (key, tracked attributes). For each
    * update whose tracked attributes DIFFER from the key's current row,
    * the current row closes (valid_to = batchDate, is_current = false)
    * and a new row opens (valid_from = batchDate, valid_to = the open-end
    * sentinel 9999-12-31 — a real date, not null, so engines/formats that
    * treat null dates differently agree and range predicates stay sargable).
    * No-change updates are ignored (idempotent re-loads); brand-new keys
    * insert as open rows; historical (non-current) rows pass through
    * untouched.
    *
    * Scale shape: ONE equi-join of the update batch against the CURRENT
    * slice on the dimension key (history rows never join), then a
    * column-compare — no window, no global sort. Dimensions are small
    * next to facts, so at 100 TB the update join broadcasts whichever
    * side is smaller; AQE picks it.
    */
  def scd2Merge(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      trackedCols: Seq[String],
      batchDate: String): DataFrame = {
    val changedCond = trackedCols
      .map(c => !(col(s"cur.$c") <=> col(s"upd.$c")))
      .reduce(_ || _)
    val current = dim.filter(col("is_current"))
    val history = dim.filter(!col("is_current"))
    val joined = current.as("cur")
      .join(updates.as("upd"), col(s"cur.$keyCol") === col(s"upd.$keyCol"), "full")
    val keyIs = (side: String) => col(s"$side.$keyCol").isNotNull
    // current rows: closed if a differing update arrived, else unchanged
    val fromCurrent = joined.filter(keyIs("cur"))
      .select(
        col(s"cur.$keyCol").as(keyCol) +:
          trackedCols.map(c => col(s"cur.$c").as(c)) :+
          col("cur.valid_from").as("valid_from") :+
          when(keyIs("upd") && changedCond, lit(batchDate).cast("date"))
            .otherwise(col("cur.valid_to")).as("valid_to") :+
          (!(keyIs("upd") && changedCond)).as("is_current"): _*)
    // new open rows: changed keys + brand-new keys
    val opened = joined
      .filter(keyIs("upd") && (!keyIs("cur") || changedCond))
      .select(
        col(s"upd.$keyCol").as(keyCol) +:
          trackedCols.map(c => col(s"upd.$c").as(c)) :+
          lit(batchDate).cast("date").as("valid_from") :+
          lit(OpenEnd).cast("date").as("valid_to") :+
          lit(true).as("is_current"): _*)
    history.select(fromCurrent.columns.map(col).toIndexedSeq: _*)
      .unionByName(fromCurrent)
      .unionByName(opened)
  }

  /** Open-end sentinel for current rows (the Kimball convention). */
  val OpenEnd = "9999-12-31"

  /** Bootstrap a versioned dimension from a plain snapshot. */
  def scd2Init(snapshot: DataFrame, loadDate: String): DataFrame =
    snapshot
      .withColumn("valid_from", lit(loadDate).cast("date"))
      .withColumn("valid_to", lit(OpenEnd).cast("date"))
      .withColumn("is_current", lit(true))
}
