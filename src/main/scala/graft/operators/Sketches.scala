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

  // ---------------------------------------------------------------------
  // Log-linear histogram quantile sketch — the QUANTILE member of the
  // sketch-as-a-table family (CMS = frequency, HLL = distinct, Bloom =
  // membership). Same family as HdrHistogram / DDSketch (Masson et al.,
  // VLDB 2019): log2 major buckets with 2^subBits linear sub-buckets give
  // a relative-error guarantee of 2^-(subBits+1) on any quantile, and the
  // sketch is a (groups × buckets)-bounded counter TABLE that merges by
  // summing counts — per-crawl/per-partition sketch rows roll up to
  // corpus-lifetime quantiles WITHOUT rescanning the source, the exact
  // contract hllSketchTable has for distincts.
  //
  // Unlike t-digest/GK (value-dependent centroids, engine-specific state)
  // every step here is INTEGER-exact and engine-portable: values quantize
  // to a cents grid (floor(v*100 + 0.5)), the major bucket is
  // length(bin(cents)) - 1 (floor-log2 with no floating log anywhere —
  // both Spark and DuckDB expose minimal-length bin()), and the
  // sub-bucket is a right-shift. A second engine replays the whole
  // sketch from the data bit-for-bit, so the catalog entry gets a full
  // hash-compare oracle where HLL only gets an error-bracket audit.
  // ---------------------------------------------------------------------

  /** Quantized cents key: floor(v·100 + 0.5). The sketch's input grid —
    * ≤ half-cent absolute quantization, negligible relative to the
    * 2^-(subBits+1) bucket bound for values ≥ 1.
    */
  private def cents(v: Column): Column =
    floor(v * 100 + 0.5).cast("long")

  /** Build the histogram sketch table: one (groupCols…, bhi, blo, ct) row
    * per occupied bucket. bhi = floor(log2(cents)) via bin-string length
    * (integer-exact), blo = the top `subBits` bits (cents >> (bhi -
    * subBits); small values bhi < subBits keep cents verbatim — exact).
    * (bhi, blo) is lexicographically monotone in the value, which is what
    * makes rank selection over cumulative counts correct. Non-positive
    * cents take the reserved bucket (-1, 0). Map-side combined groupBy;
    * the shuffle carries bounded counter rows, never values.
    */
  def logHistSketch(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      subBits: Int = 4): DataFrame = {
    val c = cents(valueCol)
    val bhi = when(c <= 0, lit(-1))
      .otherwise(length(bin(c)) - 1).cast("int")
    val blo = when(c <= 0, lit(0L))
      .otherwise(call_function("shiftright", c, greatest(bhi - subBits, lit(0))))
    df.select((groupCols.map(col) :+ bhi.as("bhi") :+ blo.as("blo")): _*)
      .groupBy((groupCols :+ "bhi" :+ "blo").map(col): _*)
      .agg(count(lit(1)).as("ct"))
  }

  /** Merge sketch rows down to `groupCols`: counts sum per bucket. The
    * read path never touches the source — N crawls' sketches roll up in
    * one bounded aggregation, and building per-partition then merging is
    * exactly equal to building once (the catalog entry proves it against
    * a direct-build oracle).
    */
  def logHistMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "bhi" :+ "blo").map(col): _*)
      .agg(sum("ct").as("ct"))

  /** Quantile estimates from a merged sketch: for each q, the midpoint of
    * the bucket holding rank ceil(q·n) (disc convention, rank ≥ 1). The
    * bucket's integer range is [blo·w, (blo+1)·w) with w = 2^max(bhi −
    * subBits, 0); midpoint (2·blo·w + w − 1)/2 cents, so the estimate is
    * within 2^-(subBits+1) relative of the true disc-quantile value
    * (exact for cents < 2^subBits, where w = 1). Cost: one window pass
    * over the BOUNDED sketch table — never a sort of the data.
    */
  def logHistQuantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double],
      subBits: Int = 4): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("bhi"), col("blo"))
    val cum = sketch
      .withColumn("cum", sum("ct").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("n", sum("ct").over(
        org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)))
    val width = call_function("shiftleft", lit(1L),
      greatest(col("bhi") - subBits, lit(0)))
    cum.crossJoin(
        qs.toDF("q").hint("broadcast"))
      .withColumn("rank", greatest(ceil(col("q") * col("n")), lit(1L)))
      .filter(col("cum") >= col("rank") && col("cum") - col("ct") < col("rank"))
      .select((gcols :+ col("q") :+
        when(col("bhi") === -1, lit(0.0))
          .otherwise(round((col("blo") * 2 * width + width - 1) / lit(2.0) / 100.0, 6))
          .as("est")): _*)
  }

  /** EXACT disc quantiles via sketch-guided selection — the two-pass scale
    * path for exact percentiles (the approxQuantile(relErr=0) job without
    * its global per-group sort): pass 1 builds the bounded sketch and
    * locates, per (group, q), the bucket holding rank ceil(q·n) plus the
    * within-bucket offset; pass 2 re-scans, keeps ONLY rows landing in a
    * winning bucket (a broadcast semi-join against groups×qs bucket ids),
    * and sorts just those. The sort input shrinks from n to the winning
    * buckets' population (≤ qs · max bucket share — the sketch bound
    * says no bucket exceeds ~2^-(subBits+1) relative width, and heavy
    * buckets are exactly what the log grid splits), which is what makes
    * this viable where `Window.orderBy(value)` over the full group is a
    * measured ×100 wall (90.8 s vs the sketch path's scan).
    *
    * Correct because bucketing is monotone non-strict in the value:
    * every row in a lower bucket is ≤ every row in the winning bucket,
    * so the global rank-r value is the (r − cum_before)-th smallest
    * within its bucket. Returns (groupCols…, q, exact_v).
    */
  def exactQuantilesViaSketch(
      df: DataFrame,
      valueCol: Column,
      groupCols: Seq[String],
      qs: Seq[Double],
      subBits: Int = 4): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "qs in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("bhi"), col("blo"))
    val win = logHistSketch(df, valueCol, groupCols, subBits)
      .withColumn("cum", sum("ct").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("n", sum("ct").over(
        org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)))
      .crossJoin(qs.toDF("q").hint("broadcast"))
      .withColumn("rank", greatest(ceil(col("q") * col("n")), lit(1L)))
      .filter(col("cum") >= col("rank") && col("cum") - col("ct") < col("rank"))
      .select((gcols :+ col("bhi") :+ col("blo") :+ col("q") :+
        (col("rank") - (col("cum") - col("ct"))).as("need")): _*)
    // pass 2: bucket every row (narrow map), keep winners, sort tiny sets
    val c = cents(valueCol)
    val bhi = when(c <= 0, lit(-1)).otherwise(length(bin(c)) - 1).cast("int")
    val blo = when(c <= 0, lit(0L))
      .otherwise(call_function("shiftright", c, greatest(bhi - subBits, lit(0))))
    val rows = df.select((gcols :+ valueCol.as("__v") :+
      bhi.as("bhi") :+ blo.as("blo")): _*)
    val sel = org.apache.spark.sql.expressions.Window
      .partitionBy((gcols :+ col("q")): _*).orderBy(col("__v"))
    rows.join(broadcast(win), groupCols ++ Seq("bhi", "blo"))
      .withColumn("rn", row_number().over(sel))
      .filter(col("rn") === col("need"))
      .select((gcols :+ col("q") :+ col("__v").as("exact_v")): _*)
  }
}
