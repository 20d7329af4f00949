package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensional-warehouse maintenance operators — the slowly-changing-
  * dimension counterpart of the reference's dimension handling (its zone
  * lookup is a static dim, reference README.md:20; a production warehouse
  * versions it). New scope beyond the reference.
  */
object Warehouse {

  /** Exact join-size forecast — "how many rows would this equi-join
    * produce, and which keys carry the blow-up" — the pre-flight audit a
    * 100 TB pipeline runs BEFORE committing to a join whose output could
    * be quadratic in a hot key:
    *
    *   |A ⋈_k B| = Σ_k cnt_A(k) · cnt_B(k)
    *
    * computed from the two key supports (each ONE map-side-combined
    * groupBy — the forecast costs two skinny aggregates, never the join).
    * Top keys by product are the salting/skew-split worklist.
    *
    * Products and their sum ACCUMULATE in decimal(38,0) (a 1e9×1e9 hot
    * key is 1e18 — int64's edge — and the sum is past it), then publish
    * on the int64 grid (the tableFingerprint fold convention): a
    * forecast beyond 9.2e18 rows is not a join anyone runs, it is the
    * diagnosis itself.
    *
    * Returns top `topK` keys: (key, c_left, c_right, product,
    * total_rows, shared_keys) — the totals repeated per row (broadcast
    * single-row reduce), product desc then key.
    */
  def joinSizeForecast(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val dec = "decimal(38,0)"
    val la = left.select(leftKey.cast("long").as("key"))
      .groupBy("key").agg(count(lit(1)).as("c_left"))
    val ra = right.select(rightKey.cast("long").as("key"))
      .groupBy("key").agg(count(lit(1)).as("c_right"))
    val prod = la.join(ra, Seq("key"))
      .withColumn("product_dec",
        col("c_left").cast(dec) * col("c_right").cast(dec))
    // the int64 publish is GUARDED, not a bare cast: Spark's non-ANSI
    // cast NULLs silently past 9.2e18 (DuckDB errors), which would turn
    // "the forecast IS the diagnosis" into a cross-engine divergence —
    // instead overflow raises with the sized total, the refusal doctrine
    val tot = broadcast(prod.agg(
      sum("product_dec").as("total_dec"),
      count(lit(1)).as("shared_keys")))
    prod.crossJoin(tot)
      .withColumn("total_rows",
        when(col("total_dec") <= lit(Long.MaxValue).cast(dec),
          col("total_dec").cast("long"))
          .otherwise(raise_error(concat(
            lit("joinSizeForecast: forecast join size "),
            col("total_dec").cast("string"),
            lit(" rows overflows int64 — this join must not run; " +
              "split/salt the top keys below first"))).cast("long")))
      // per-key product needs no second guard: total = Σ products bounds
      // every product, so a passing total implies each product fits
      .select(col("key"), col("c_left"), col("c_right"),
        col("product_dec").cast("long").as("product"),
        col("total_rows"), col("shared_keys"))
      .orderBy(col("product").desc, col("key"))
      .limit(topK)
  }

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
