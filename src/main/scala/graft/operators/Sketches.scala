package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the bounded-memory
  * frequency sketch beside the repo's HLL (distinct) and Bloom
  * (membership) rows. depth hash rows × width counters; estimate =
  * min over rows of the addressed counter. Overestimates only:
  * est ≥ true, and est ≤ true + εN with ε = e/width at the usual
  * failure bound — the `q_cms_heavy_hitters` audit checks both sides.
  *
  * Hash rows are [[PortableHash.portable60]] of "d:value", so the whole
  * sketch is a deterministic TABLE any engine rebuilds from the data —
  * the same identity-at-rest rationale as the Bloom filter's
  * distinct-position table. Scale shape: the sketch is a
  * (depth × width)-bounded aggregate (map-side combined, broadcastable
  * however large the stream of values); estimation is a key join against
  * it, never a rescan of the source.
  */
object Sketches {

  /** Build the CMS counter table (d, slot, ct) from a value column. */
  def cmsBuild(
      df: DataFrame,
      valueCol: Column,
      width: Int = 1024,
      depth: Int = 4): DataFrame =
    df.select(explode(array((0 until depth).map(lit): _*)).as("d"),
        valueCol.cast("string").as("__v"))
      .select(col("d"),
        (PortableHash.portable60(concat_ws(":", col("d"), col("__v")))
          % width).as("slot"))
      .groupBy("d", "slot").agg(count(lit(1)).as("ct"))

  /** The heavy-hitter audit as one frame: exact top-`topN` values vs the
    * sketch's estimates, with the measured overcount per value. The value
    * stream feeds both the exact side and the sketch — persisted once.
    */
  def cmsHeavyHitters(
      df: DataFrame,
      valueCol: Column,
      topN: Int = 15,
      width: Int = 1024,
      depth: Int = 4): DataFrame = {
    val vals = OperatorCaches.persistTracked(df.select(valueCol.as("v")))
    val exact = vals.groupBy("v").agg(count(lit(1)).as("exact_ct"))
      .orderBy(col("exact_ct").desc, col("v")).limit(topN)
    val est = cmsEstimate(exact, cmsBuild(vals, col("v"), width, depth),
      col("v"), width, depth)
    exact.join(est, col("v") === col("value"))
      .select(col("v").as("token"), col("exact_ct"), col("cms_ct"),
        (col("cms_ct") - col("exact_ct")).as("overcount"))
      .orderBy(col("exact_ct").desc, col("token"))
  }

  /** Point-estimate counts for `queries`' value column against a built
    * sketch: min over the depth rows of the addressed counters.
    */
  def cmsEstimate(
      queries: DataFrame,
      cms: DataFrame,
      valueCol: Column,
      width: Int = 1024,
      depth: Int = 4): DataFrame = {
    val probes = queries
      .select(valueCol.cast("string").as("value"))
      .distinct()
      .select(col("value"),
        explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("value"), col("d"),
        (PortableHash.portable60(concat_ws(":", col("d"), col("value")))
          % width).as("slot"))
    probes.join(cms, Seq("d", "slot"))
      .groupBy("value")
      .agg(min("ct").as("cms_ct"))
  }

  /** Per-group HyperLogLog sketch TABLE (Apache DataSketches via Spark's
    * `hll_sketch_agg`) — the persistable distinct-count state for
    * incremental corpora: each crawl/batch contributes one bounded binary
    * sketch row per group, and corpus-lifetime distinct counts come from
    * merging sketch rows ([[hllMergeEstimate]]) WITHOUT ever rescanning
    * earlier crawls' bodies. The distinct-count member of the
    * sketch-as-a-table family beside the CMS counter table (frequency)
    * and the Bloom position table (membership). Sketch size is
    * 2^lgK registers regardless of stream cardinality, so the table is
    * (groups × 2^lgK)-bounded at any corpus size and the merge is a
    * tiny aggregation over it.
    *
    * Unlike the CMS/Bloom tables the sketch BYTES are engine-specific
    * (DataSketches binary format), so catalog gating follows the
    * `q_approx_distinct` audit convention: the oracle recomputes the
    * exact side and the estimate must land inside the published error
    * bracket — never a byte compare.
    */
  def hllSketchTable(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("hll"))

  /** Merge sketch rows down to `groupCols` and estimate distincts —
    * the read path of [[hllSketchTable]]: reads ONLY the sketch table
    * (never the source), so a corpus-lifetime distinct count over N
    * crawls costs one aggregation of N×groups bounded rows.
    */
  def hllMergeEstimate(
      sketches: DataFrame,
      groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as("approx_distinct"))
}
