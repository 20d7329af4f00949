package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join composed from bucketing + equi-join — the
  * scalable rewrite of `points JOIN intervals ON start <= pt AND pt <= end`,
  * which Spark would otherwise plan as a broadcast-nested-loop (O(n·m)
  * comparisons and a broadcast of a whole side).
  *
  * Points map to one bucket of width `bucketSize`; intervals explode to
  * every bucket they overlap; an equi-join on the bucket id followed by the
  * exact band predicate gives the same pairs with a plain hash shuffle.
  * A point lies in exactly one bucket, so no pair can match twice — no
  * dedup pass.
  *
  * Choosing bucketSize is a skew/fan-out tradeoff: width ≈ interval length
  * minimizes interval fan-out (~2 buckets each) but makes the join key
  * low-cardinality — with few distinct buckets the whole join collapses
  * onto a handful of tasks (measured 65 s vs 3 s on the same data). Prefer
  * bucketSize ≈ intervalLength / 10..20 so the key space comfortably
  * exceeds the cluster's core count; the extra exploded interval rows are
  * cheap next to the parallelism they buy.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      pt: Column,
      intervals: DataFrame,
      start: Column,
      end: Column,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    // collision-free temp key: a fixed "__bucket" would silently clobber a
    // caller column of that name (and corrupt the drop below)
    val taken = (points.columns ++ intervals.columns).toSet
    val bucket = Iterator.from(0).map(i => s"__graft_bucket_$i")
      .find(!taken.contains(_)).get
    val p = points.withColumn(bucket, floor(pt / bucketSize).cast("long"))
    val i = intervals
      .withColumn(bucket,
        explode(sequence(
          floor(start / bucketSize).cast("long"),
          floor(end / bucketSize).cast("long"))))
    p.join(i, Seq(bucket))
      .filter(pt >= start && pt <= end)
      .drop(bucket)
  }

  /** 2-D radius self-join via grid bucketing — the scalable rewrite of
    * `a JOIN b ON dist(a, b) <= r`, which Spark would otherwise plan as a
    * cartesian with a distance filter. Each point lands in ONE grid cell
    * of side `r` (floor semantics, so negative coordinates bucket
    * correctly in both engines); the LEFT occurrence of each point
    * explodes to its 3×3 cell neighborhood and equi-joins the unexploded
    * RIGHT side on the cell id. Any pair within distance r differs by at
    * most r per axis, hence at most one cell index per axis — the 3×3
    * neighborhood is exhaustive, and because the right point owns exactly
    * one cell, no pair can match twice (no dedup pass). `id_a < id_b`
    * keeps each unordered pair once.
    *
    * EXACT (not approximate): the candidate set is then filtered by the
    * true integer squared distance. `x`/`y` are integral (units — the
    * bin-first contract); dist2 = dx² + dy² needs |coord range| ≲ 2e9 to
    * stay inside int64, far past any sane unit grid.
    *
    * Scale levers: the shuffle is keyed by cell id (cardinality ≈ area/r²
    * — keep it well above the core count by choosing unit grids so that
    * r is small relative to the extent); candidate volume is
    * Σ_cells 9·|cell|², so a DENSITY HOT-SPOT (one cell holding k points)
    * costs 9k² comparisons. `maxExpectedCandidates` (opt-in, the
    * expectedHammingCandidates pattern) pre-flights that sum from cell
    * counts in one cheap aggregate and fails fast with a sized diagnosis
    * naming the levers (shrink r, thin the hot cell) instead of hanging.
    *
    * Returns (id_a, id_b, dist2).
    */
  def radiusPairs(
      points: DataFrame,
      idCol: Column,
      xCol: Column,
      yCol: Column,
      r: Long,
      maxExpectedCandidates: Option[Long] = None): DataFrame = {
    require(r > 0, "r must be positive")
    val base = points.select(idCol.cast("long").as("id"),
      xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .withColumn("cx", floor(col("x") / r).cast("long"))
      .withColumn("cy", floor(col("y") / r).cast("long"))
    maxExpectedCandidates.foreach { ceiling =>
      // coalesce: empty input ⇒ NULL sum must pass the gate as 0, not NPE
      val est = base.groupBy("cx", "cy").agg(count(lit(1)).as("k"))
        .agg(coalesce(sum(col("k") * col("k") * 9L), lit(0L)))
        .head().getLong(0)
      require(est <= ceiling,
        s"radiusPairs pre-flight: ~$est grid-join candidate pairs " +
          s"(Σ 9·|cell|² over occupied cells; ceiling $ceiling). " +
          s"Shrink r (currently $r) or thin density hot-spots before " +
          s"joining.")
    }
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val left = base
      .withColumn("o", explode(array(offsets.map { case (dx, dy) =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")) }: _*)))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("o.dx")).as("jx"),
        (col("cy") + col("o.dy")).as("jy"))
    val right = base.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
    left.join(right, Seq("jx", "jy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select("id_a", "id_b", "dist2")
  }

  /** Interval×interval OVERLAP self-join per key, counted exactly once
    * per pair — the temporal-conflict shape ("which shipping windows of
    * the same supplier overlap", double-booking detection) that a naive
    * self-join plans as a per-key cross product.
    *
    * Bucketed rewrite: every interval explodes to the `bucketSize`-wide
    * buckets it touches; candidates equi-join on (key, bucket); the
    * exact closed-interval predicate sA ≤ eB ∧ sB ≤ eA filters; and each
    * surviving pair is counted at ONE canonical bucket — the bucket of
    * max(sA, sB), the left edge of the overlap — so no distinct pass is
    * ever needed (the radiusPairs one-cell-ownership trick in 1-D).
    *
    * Scale contract: fan-out per interval is len/bucketSize + 1 rows;
    * candidate volume per (key, bucket) is its occupancy² — size buckets
    * a few× the typical interval length so occupancy stays O(overlap
    * degree), and pre-cap pathological keys upstream (the maxDf/hub-cap
    * doctrine). All arithmetic integral. This form MATERIALIZES the
    * candidate pairs — use it when you need to inspect the conflicts;
    * when only the per-key COUNT is wanted, [[intervalOverlapCount]] is
    * the O(n log n) sweep that never builds a pair (measured: the pair
    * join is Σ occupancy² and dies at dense decades — the r11 ×1000
    * kill). `maxExpectedCandidates` is the radiusPairs-style opt-in
    * pre-flight: one cheap occupancy aggregate prices Σ occ² and fails
    * in seconds with the sized diagnosis instead of hours into the join.
    *
    * Returns (key, n_intervals, n_overlaps) top `topK` by n_overlaps
    * desc then key.
    */
  def intervalOverlapPairs(
      intervals: DataFrame,
      keyCol: Column,
      idCol: Column,
      startCol: Column,
      endCol: Column,
      bucketSize: Long,
      topK: Int = 20,
      maxExpectedCandidates: Option[Long] = None): DataFrame = {
    require(bucketSize > 0 && topK >= 1, "need positive bucketSize/topK")
    val base = intervals.select(keyCol.cast("long").as("g"),
        idCol.cast("long").as("id"), startCol.cast("long").as("s"),
        endCol.cast("long").as("e"))
      .filter(col("e") >= col("s"))
    val exploded = base.withColumn("bucket",
      explode(sequence(expr(s"s div $bucketSize"), expr(s"e div $bucketSize"))))
    maxExpectedCandidates.foreach { ceiling =>
      // coalesce: sum over zero groups is NULL — an empty input must
      // pass the gate (0 candidates), not NPE out of getLong
      val est = exploded.groupBy("g", "bucket")
        .agg(count(lit(1)).as("occ"))
        .agg(coalesce(sum(col("occ") * col("occ")), lit(0L)).as("cand"))
        .head().getLong(0)
      require(est <= ceiling,
        s"intervalOverlapPairs would scan ~$est candidate pairs " +
          s"(Sigma occupancy^2 over (key, bucket); ceiling $ceiling). " +
          "Use intervalOverlapCount for counts (linear sweep), raise " +
          "bucketSize, or pre-cap dense keys — or raise the ceiling if " +
          "the cluster is sized for it.")
    }
    val a = exploded.select(col("g"), col("bucket"), col("id").as("id_a"),
      col("s").as("sa"), col("e").as("ea"))
    val b = exploded.select(col("g"), col("bucket"), col("id").as("id_b"),
      col("s").as("sb"), col("e").as("eb"))
    val pairs = a.join(b, Seq("g", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        expr(s"greatest(sa, sb) div $bucketSize") === col("bucket"))
    val perKey = pairs.groupBy("g").agg(count(lit(1)).as("n_overlaps"))
    val counts = base.groupBy("g").agg(count(lit(1)).as("n_intervals"))
    counts.join(perKey, Seq("g"), "left")
      .select(col("g").as("key"), col("n_intervals"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy(col("n_overlaps").desc, col("key"))
      .limit(topK)
  }

  /** Exact per-key overlap-pair COUNT without materializing a single
    * pair — the scale path beside [[intervalOverlapPairs]]: each pair is
    * counted at its LATER-starting member (order (s, id)), whose count
    * of already-open intervals is
    *
    *   active(i) = rank_{(s,id)}(i) − #{j : e_j < s_i} − 1
    *
    * and Σ active = the pair count. The strict e < s lookup rides the
    * parity trick: ends live at coordinate 2e+1, starts probe at 2s, so
    * 2e+1 < 2s ⟺ e < s and no tie between kinds can exist. Two window
    * passes per key over 2n rows — O(n log n), no occupancy² anywhere.
    *
    * Returns (key, n_intervals, n_overlaps) top `topK` by n_overlaps
    * desc then key — same shape as the pair-materializing form, so the
    * two are interchangeable (and cross-check each other in the spec).
    */
  def intervalOverlapCount(
      intervals: DataFrame,
      keyCol: Column,
      idCol: Column,
      startCol: Column,
      endCol: Column,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK must be positive")
    val base = intervals.select(keyCol.cast("long").as("g"),
        idCol.cast("long").as("id"), startCol.cast("long").as("s"),
        endCol.cast("long").as("e"))
      .filter(col("e") >= col("s"))
    val ranked = base.withColumn("rs", row_number().over(
      Window.partitionBy("g").orderBy(col("s"), col("id"))).cast("long"))
    val probes = ranked.select(col("g"), (col("s") * 2).as("coord"),
      lit(0L).as("is_end"), col("rs"))
    val ends = ranked.select(col("g"), (col("e") * 2 + 1).as("coord"),
      lit(1L).as("is_end"), lit(null).cast("long").as("rs"))
    val wc = Window.partitionBy("g").orderBy("coord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val active = probes.unionByName(ends)
      .withColumn("ends_lt", sum("is_end").over(wc))
      .filter(col("is_end") === 0L)
      .select(col("g"),
        (col("rs") - col("ends_lt") - 1L).as("active"))
    val counts = base.groupBy("g").agg(count(lit(1)).as("n_intervals"))
    counts.join(
        active.groupBy("g").agg(sum("active").as("n_overlaps")),
        Seq("g"), "left")
      .select(col("g").as("key"), col("n_intervals"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy(col("n_overlaps").desc, col("key"))
      .limit(topK)
  }

  /** Union length of a key's closed integer intervals — "how many
    * distinct days was this supplier actually shipping" — via the sweep
    * identity: sort by start, clip each interval at the running max end
    * of its PREDECESSORS, sum the positive remainders. One window pass
    * per key, exact integers, no pairwise anything.
    *
    * Returns (key, n_intervals, covered, span) top `topK` by covered
    * desc then key — `covered` the union length in grid units, `span`
    * max(e) − min(s) + 1 (so covered/span is the occupancy diagnostic).
    */
  def intervalCoverage(
      intervals: DataFrame,
      keyCol: Column,
      startCol: Column,
      endCol: Column,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK must be positive")
    val base = intervals.select(keyCol.cast("long").as("g"),
        startCol.cast("long").as("s"), endCol.cast("long").as("e"))
      .filter(col("e") >= col("s"))
    val w = Window.partitionBy("g").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prev_max", max("e").over(w))
      .withColumn("clip_s",
        greatest(col("s"), coalesce(col("prev_max") + 1L, col("s"))))
      .withColumn("contrib",
        greatest(lit(0L), col("e") - col("clip_s") + 1L))
      .groupBy("g")
      .agg(count(lit(1)).as("n_intervals"), sum("contrib").as("covered"),
        (max("e") - min("s") + 1L).as("span"))
      .select(col("g").as("key"), col("n_intervals"), col("covered"),
        col("span"))
      .orderBy(col("covered").desc, col("key"))
      .limit(topK)
  }
}
