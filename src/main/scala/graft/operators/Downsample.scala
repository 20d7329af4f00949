package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series downsampling — the metrics/market primitives that turn an
  * unbounded event stream into bounded bars and summaries a dashboard or
  * model can hold: OHLC bars and time-weighted averages. Corpus-scale
  * inputs (NOT the Trend bounded-series contract): every operator here
  * is one window pass partitioned by its key, then a bounded roll-up —
  * the shape that survives 100 TB because the only global structure is
  * per-key ordering, which the shuffle already provides.
  *
  * Determinism: the per-key order is (second, id) — total, so open/close
  * picks and every held-value interval are identical across engines,
  * partitionings, and runs.
  */
object Downsample {

  /** OHLC bars: per (key, bucket) the open (first value in (sec, id)
    * order), high, low, close (last value), count, and exact unit sum —
    * the candlestick / metrics-rollup downsampler.
    *
    * One window pass (row_number + partition count) over a shuffle keyed
    * by (key, bucket), then a conditional aggregate — open is the rn = 1
    * row, close the rn = n row, so no first_value/last_value frame
    * semantics to align across engines.
    *
    * Returns (key, bucket, n, open, high, low, close, sum_units)
    * ordered by (key, bucket); `bucket` = floor(sec / bucketSec).
    */
  def ohlcBars(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      idCol: Column,
      valueUnitsCol: Column,
      bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, "bucketSec must be positive")
    val base = events.select(keyCol.as("key"),
      unix_timestamp(tsCol).as("sec"), idCol.cast("long").as("id"),
      valueUnitsCol.cast("long").as("v"))
      // floor division, not `div` (truncation toward zero): pre-1970
      // timestamps have negative epoch seconds, and the DuckDB twin's
      // `//` floors — (sec − pmod(sec, b)) is the largest multiple of b
      // ≤ sec (pmod ≥ 0), so the div is exact and floor-valued for all
      // signs, in pure long arithmetic
      .withColumn("bucket",
        expr(s"(sec - pmod(sec, $bucketSec)) div $bucketSec"))
    val w = Window.partitionBy("key", "bucket").orderBy(col("sec"), col("id"))
    val wn = Window.partitionBy("key", "bucket")
    base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("key", "bucket")
      .agg(max("n").as("n"),
        max(when(col("rn") === 1L, col("v"))).as("open"),
        max("v").as("high"), min("v").as("low"),
        max(when(col("rn") === col("n"), col("v"))).as("close"),
        sum("v").as("sum_units"))
      .orderBy("key", "bucket")
  }

  /** Time-weighted average value per key over [first event, last event]:
    * each value HOLDS until the next event (step function), so
    *
    *   TWAP = Σ v_i · (t_{i+1} − t_i) / (t_last − t_first)
    *
    * — the "average concurrent value" that a plain mean gets wrong
    * whenever sampling is irregular (the position/exposure/gauge
    * semantics). Keys with fewer than 2 distinct instants have no
    * interval to integrate — explicit NULL twap, count still reported.
    *
    * Cross-engine determinism: values are integral units, interval
    * lengths integral seconds; each product and the sum accumulate in
    * decimal(38,0) (units × seconds × corpus passes int64), one final
    * division onto the 6-dp grid.
    *
    * Returns (key, n_events, span_sec, twap) top `topK` by twap desc
    * (NULLs last) then key.
    */
  def twap(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      idCol: Column,
      valueUnitsCol: Column,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy("key").orderBy(col("sec"), col("id"))
    events.select(keyCol.as("key"), unix_timestamp(tsCol).as("sec"),
        idCol.cast("long").as("id"), valueUnitsCol.cast("long").as("v"))
      .withColumn("sec_next", lead("sec", 1).over(w))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        (max("sec") - min("sec")).as("span_sec"),
        sum(when(col("sec_next").isNotNull,
          col("v").cast(dec) * (col("sec_next") - col("sec")).cast(dec)))
          .as("area"))
      .select(col("key"), col("n_events"), col("span_sec"),
        when(col("span_sec") > 0L,
          round(col("area").cast("double") / col("span_sec"), 6))
          .as("twap"))
      .orderBy(col("twap").desc_nulls_last, col("key"))
      .limit(topK)
  }
}
