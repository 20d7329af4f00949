package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event-path analytics over a (user, timestamp, type) stream:
  * sequential patterns, multi-touch attribution, and the Markov view of
  * the type-transition structure. The behavioral companions to the
  * funnel/cohort/sessionization entries — "what ORDER do things happen
  * in", where those ask "do they happen".
  *
  * Shared distributed shape: every operator here starts from ONE window
  * pass partitioned by user (ordered by time with an id tie-break — total
  * order per user, so every downstream number is deterministic), then
  * folds to a bounded support (type pairs, K-row state vectors, per-type
  * credit sums). Shuffles carry users once, then supports — never raw
  * events twice.
  */
object PathAnalytics {

  /** Sequential bigram mining: counts of ordered (type -> next type)
    * transitions per user where the gap is at most `maxGapSec` seconds —
    * the PrefixSpan-depth-2 cut that answers "what follows what" without
    * the exponential pattern lattice (sufficient for next-event models
    * and UI-flow audits; deeper patterns compose by re-running on the
    * emitted pairs).
    *
    * Distributed shape: one shuffle on user for the lead() window, one
    * map-side-combined groupBy over the K² bounded pair support, top-k
    * as TakeOrderedAndProject. Ties broken by (pair) for a deterministic
    * cut. Gap semantics: the NEXT event must start within maxGapSec of
    * the current one (lead(ts) − ts ≤ maxGapSec); a user's last event has
    * no successor and contributes nothing.
    *
    * Returns (type_a, type_b, n_pairs, n_users) — pair count and the
    * number of distinct users exhibiting the transition — top `topK`
    * rows by n_pairs desc, then pair.
    */
  def seqBigrams(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      maxGapSec: Long,
      topK: Int = 15): DataFrame = {
    require(maxGapSec >= 1 && topK >= 1, "need positive gap and topK")
    val w = Window.partitionBy("u").orderBy(col("sec"), col("id"))
    events
      .select(userCol.cast("long").as("u"),
        unix_timestamp(tsCol).as("sec"), idCol.cast("long").as("id"),
        typeCol.cast("string").as("ty"))
      .withColumn("ty_next", lead("ty", 1).over(w))
      .withColumn("sec_next", lead("sec", 1).over(w))
      .filter(col("ty_next").isNotNull &&
        col("sec_next") - col("sec") <= maxGapSec)
      .groupBy(col("ty").as("type_a"), col("ty_next").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("u")).as("n_users"))
      .orderBy(col("n_pairs").desc, col("type_a"), col("type_b"))
      .limit(topK)
  }

  /** Sequential trigram mining — the depth-3 sibling of [[seqBigrams]]:
    * ordered (type → type → type) transitions where BOTH consecutive
    * gaps are at most `maxGapSec` (a path, not just co-presence). Same
    * shape: one user-window pass with two leads, one map-side-combined
    * groupBy over the bounded K³ support, deterministic top-k.
    *
    * Returns (type_a, type_b, type_c, n_triples, n_users) top `topK`
    * by n_triples desc then the triple.
    */
  def seqTrigrams(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      maxGapSec: Long,
      topK: Int = 15): DataFrame = {
    require(maxGapSec >= 1 && topK >= 1, "need positive gap and topK")
    val w = Window.partitionBy("u").orderBy(col("sec"), col("id"))
    events
      .select(userCol.cast("long").as("u"),
        unix_timestamp(tsCol).as("sec"), idCol.cast("long").as("id"),
        typeCol.cast("string").as("ty"))
      .withColumn("ty2", lead("ty", 1).over(w))
      .withColumn("sec2", lead("sec", 1).over(w))
      .withColumn("ty3", lead("ty", 2).over(w))
      .withColumn("sec3", lead("sec", 2).over(w))
      .filter(col("ty3").isNotNull &&
        col("sec2") - col("sec") <= maxGapSec &&
        col("sec3") - col("sec2") <= maxGapSec)
      .groupBy(col("ty").as("type_a"), col("ty2").as("type_b"),
        col("ty3").as("type_c"))
      .agg(count(lit(1)).as("n_triples"),
        countDistinct(col("u")).as("n_users"))
      .orderBy(col("n_triples").desc, col("type_a"), col("type_b"),
        col("type_c"))
      .limit(topK)
  }

  /** Multi-touch attribution: split conversion credit across the touch
    * events preceding each user's FIRST conversion, under the linear
    * (1/k each) and U-shaped/position (40% first, 40% last, middles
    * share 20%; 100%/50-50 for 1-/2-touch paths) models — the marketing
    * "which channel actually drove the purchase" allocator.
    *
    * Path definition: all non-conversion events of the user STRICTLY
    * before the first conversion instant (ties on the conversion second
    * broken by event id: an event is a touch iff (sec, id) < (sec, id)
    * of the earliest conversion in that order). Users who never convert
    * contribute nothing.
    *
    * Cross-engine determinism: credits are materialized as exact BIGINT
    * micro-units via floor division — linear = 10^12 div k per touch,
    * U-mid = 2*10^11 div (k-2) — so the per-channel sums are exact
    * integers in both engines and the ONLY doubles are the two final
    * divisions onto the 6-dp grid. (Per-path credit then sums to ≤ 10^12
    * within one floor-loss unit per touch — auditable, never drifting.)
    *
    * Distributed shape: one window pass on user (rank touches, count k),
    * then one map-side-combined groupBy over the bounded channel support.
    *
    * Returns (channel, n_touches, n_paths, linear_credit, u_credit)
    * ordered by linear_credit desc, channel — credits in conversions.
    */
  def multiTouchAttribution(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      channelCol: Column,
      isConversion: Column): DataFrame = {
    val base = events.select(userCol.cast("long").as("u"),
      unix_timestamp(tsCol).as("sec"), idCol.cast("long").as("id"),
      channelCol.cast("string").as("ch"),
      isConversion.cast("boolean").as("conv"))
    // first conversion instant per user, in the (sec, id) total order
    val wu = Window.partitionBy("u")
    val withConv = base
      .withColumn("conv_sec", min(when(col("conv"), col("sec"))).over(wu))
      .withColumn("conv_id",
        min(when(col("conv") && col("sec") === col("conv_sec"), col("id")))
          .over(wu))
      .filter(col("conv_sec").isNotNull && !col("conv") &&
        (col("sec") < col("conv_sec") ||
          (col("sec") === col("conv_sec") && col("id") < col("conv_id"))))
    val wp = Window.partitionBy("u").orderBy(col("sec"), col("id"))
    val touches = withConv
      .withColumn("pos", row_number().over(wp).cast("long"))
      .withColumn("k", count(lit(1)).over(wu))
    val M = 1000000000000L // 10^12 micro-units = one conversion
    val linU = expr(s"$M div k")
    val uU = when(col("k") === 1L, lit(M))
      .when(col("k") === 2L, lit(M / 2))
      .otherwise(when(col("pos") === 1L || col("pos") === col("k"),
        lit(4L * (M / 10))).otherwise(expr(s"${2L * (M / 10)} div (k - 2)")))
    touches
      .select(col("ch"), col("u"), linU.as("lin_u"), uU.as("u_u"))
      .groupBy("ch")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("u")).as("n_paths"),
        // unit sums carry n_paths * 10^12 — decimal(38,0) (the house Dec
        // convention) so a billion-path corpus cannot wrap Spark's int64
        // where DuckDB would promote to HUGEINT
        sum(col("lin_u").cast("decimal(38,0)")).as("lin_units"),
        sum(col("u_u").cast("decimal(38,0)")).as("uu_units"))
      .select(col("ch").as("channel"), col("n_touches"), col("n_paths"),
        round(col("lin_units").cast("double") / M, 6).as("linear_credit"),
        round(col("uu_units").cast("double") / M, 6).as("u_credit"))
      .orderBy(col("linear_credit").desc, col("channel"))
  }

  /** Stationary distribution of the event-type Markov chain: transition
    * counts from consecutive (type -> next type) pairs per user (the
    * same total order as [[seqBigrams]], no gap bound), row-normalized
    * to probabilities, then `iterations` synchronous power-iteration
    * steps from the uniform start — "where does the behavior flow settle".
    *
    * SEMANTICS ARE A FIXED ROUND COUNT (the pageRank convention): each
    * step anchors the state vector on the 12-dp grid, so an independent
    * engine replays the identical trajectory and the final 6-dp output
    * is bit-stable despite K-term float sums. Types with no outgoing
    * transitions keep their mass (self-loop patch — the dangling-node
    * treatment), so the vector stays a distribution.
    *
    * Distributed shape: one user-window pass to pairs, one groupBy to
    * the K² support, then `iterations` joins over K- and K²-row frames —
    * all broadcast-sized; the only corpus-scale work is the first pass.
    *
    * Returns (state, pi) ordered by state — the stationary mass on the
    * 6-dp grid.
    */
  def markovStationary(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      iterations: Int = 12): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    val w = Window.partitionBy("u").orderBy(col("sec"), col("id"))
    val pairs = events
      .select(userCol.cast("long").as("u"),
        unix_timestamp(tsCol).as("sec"), idCol.cast("long").as("id"),
        typeCol.cast("string").as("ty"))
      .withColumn("ty_next", lead("ty", 1).over(w))
      .filter(col("ty_next").isNotNull)
    // the K²-row transition table and K-row state list are the ONLY
    // things the rounds touch — localCheckpoint them once, or every one
    // of the `iterations` jobs re-runs the corpus-scale window pass
    // behind them (measured: 288 s -> the corpus pass times 12 at ×1000)
    val trans = pairs.groupBy(col("ty").as("a"), col("ty_next").as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rowTot = trans.groupBy("a").agg(sum("n").as("row_n"))
    val p = broadcast(trans.join(rowTot, Seq("a"))
      .select(col("a"), col("b"),
        (col("n").cast("double") / col("row_n")).as("p"))
      .localCheckpoint())
    // all observed states (sources and sinks)
    val states = broadcast(
      trans.select(col("a").as("state"))
        .unionByName(trans.select(col("b").as("state")))
        .distinct()
        .localCheckpoint())
    val k = states.count()
    require(k >= 1 && k <= 1000,
      s"state space $k outside [1, 1000] — the unrolled broadcast plan " +
        "is sized for a bounded type alphabet")
    val hasOut = broadcast(rowTot.select(col("a").as("state"))
      .withColumn("has_out", lit(true)))
    var pi = states.crossJoin(
        broadcast(states.agg(count(lit(1)).as("kk"))))
      .select(col("state"),
        round(lit(1.0) / col("kk"), 12).as("pi"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val flowed = pi.join(p, pi("state") === p("a"))
        .groupBy(col("b").as("state"))
        .agg(sum(col("pi") * col("p")).as("inflow"))
      // sink states (no outgoing row in P) keep their own mass
      val kept = pi.join(hasOut, Seq("state"), "left")
        .filter(col("has_out").isNull)
        .select(col("state"), col("pi").as("kept"))
      // pi feeds BOTH flowed and kept: lineage-cut per step or the plan
      // doubles per iteration (the kCore 3^rounds plan-growth mode) —
      // the state is K rows, the checkpoint is microseconds
      pi = states
        .join(flowed, Seq("state"), "left")
        .join(kept, Seq("state"), "left")
        .select(col("state"),
          round(coalesce(col("inflow"), lit(0.0)) +
            coalesce(col("kept"), lit(0.0)), 12).as("pi"))
        .localCheckpoint()
    }
    pi.select(col("state"), round(col("pi"), 6).as("pi")).orderBy("state")
  }
}
