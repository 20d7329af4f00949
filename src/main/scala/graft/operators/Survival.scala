package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event analytics. The estimator that handles CENSORING — the
  * defining feature of retention/churn data, where most subjects haven't
  * churned yet and a naive duration average is biased low.
  */
object Survival {

  /** Kaplan–Meier product-limit survival estimate (Kaplan & Meier 1958,
    * JASA 53): given one row per subject with an integer `duration` and an
    * `event` flag (1 = the event was observed at `duration`, 0 = censored
    * at `duration`), return the survival curve at each observed EVENT time:
    *   S(t_i) = prod_{j <= i} (1 - d_j / n_j)
    * with d_j events at time t_j and n_j subjects still at risk (duration
    * >= t_j). Censored subjects leave the risk set without contributing an
    * event — exactly the correction a plain duration histogram lacks.
    *
    * Cross-engine determinism: d_j and n_j are exact integers, so each
    * factor is one correctly-rounded division. The product is evaluated as
    * exp(sum(log)) with the log term snapped to a 10-dp grid (libm log
    * implementations may differ in the last ulp; 10 dp is ~1e7 coarser) and
    * the cumulative sum runs in the one canonical time order, so the exp
    * argument is bit-identical in any engine; the 6-dp output grid absorbs
    * exp's final-ulp freedom. A factor of exactly 0 (everyone at risk dies
    * at t) would be log-undefined, so S pins to 0 from that time on via an
    * explicit cumulative-min guard — same CASE in the oracle.
    *
    * Scale shape: the only full-data pass is the groupBy(duration) count
    * (map-side combined longs). The curve state is one row per distinct
    * duration, so the unpartitioned cumulative windows over it are a
    * deliberate bounded single-partition tail — the same envelope as
    * every audit-sized output in the catalog, VALID ONLY WHILE THE
    * DISTINCT-DURATION SUPPORT IS BOUNDED.
    *
    * BIN-FIRST CONTRACT (the AUC/isotonic convention): durations at
    * days/weeks granularity keep the support in the thousands at any
    * corpus size, but second-resolution durations on a 100 TB event
    * table yield ~10⁷ distinct t on one partition — bucket first. Pass
    * `binWidth` > 1 to bucket durations to floor(t/binWidth)·binWidth
    * (the bucket LOWER BOUND, deterministic integer arithmetic in any
    * engine; durations must be non-negative) — the curve is then the KM
    * estimate of the coarsened durations, with the support bounded by
    * range/binWidth whatever the corpus does. binWidth = 1 (default) is
    * the exact estimator, bit-identical to the pre-contract behavior.
    */
  /** Two-group log-rank test (Mantel 1966) — the inference companion to
    * [[kaplanMeier]]: does group 1's survival curve differ from group
    * 0's? At each event time t the observed group-1 events d1_t are
    * compared with the hypergeometric expectation e1_t = d_t·n1_t/n_t;
    * the statistic is (Σ(d1_t − e1_t))² / Σv_t with
    * v_t = d_t·(n1_t/n_t)·(1 − n1_t/n_t)·(n_t − d_t)/(n_t − 1).
    *
    * Every term is a correctly-rounded function of exact integer counts,
    * so the statistic is cross-engine deterministic against the 6-dp
    * grid; the α = 0.05 decision uses the 1-dof critical value 3.841
    * (the q_srm_check convention — state the gate, don't ship a CDF).
    * Single-event times (n_t = 1) contribute v_t via the explicit
    * (n_t − 1) ≥ 1 guard in both engines.
    *
    * Scale shape: one groupBy(duration, group) pass; risk sets come from
    * cumulative windows over the distinct-duration support (the
    * kaplanMeier envelope — and the same BIN-FIRST CONTRACT: the
    * single-partition window is bounded only while the support is; pass
    * `binWidth` > 1 to bucket second-resolution durations, which
    * coarsens the test's time grid exactly as ties already do). Returns
    * one row: (d1_obs, e1_exp, chi2, significant).
    */
  def logRank(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event",
      groupCol: String = "g",
      binWidth: Long = 1L): DataFrame = {
    val byT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(binnedT(durationCol, binWidth).as("t"))
      .agg(count(lit(1)).as("n_at_t"),
        sum(col(eventCol).cast("long")).as("d_t"),
        sum(when(col(groupCol) === 1, 1L).otherwise(0L)).as("n1_at_t"),
        sum(when(col(groupCol) === 1, col(eventCol).cast("long"))
          .otherwise(0L)).as("d1_t"))
    val wRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byT
      .withColumn("n_t", sum("n_at_t").over(wRisk))
      .withColumn("n1_t", sum("n1_at_t").over(wRisk))
      .filter(col("d_t") > 0)
      .withColumn("frac1", col("n1_t").cast("double") / col("n_t"))
      .withColumn("e1_t", col("d_t") * col("frac1"))
      .withColumn("v_t", col("d_t") * col("frac1")
        * (lit(1.0) - col("frac1"))
        * (col("n_t") - col("d_t")).cast("double")
        / greatest(col("n_t") - 1L, lit(1L)))
      .agg(sum("d1_t").as("d1_obs"),
        round(sum("e1_t"), 6).as("e1_exp"),
        // explicit product, not pow(x, 2): IEEE multiply is exact-by-
        // definition on both engines, Math.pow is only 1-ulp-correct
        round(sum(col("d1_t") - col("e1_t"))
          * sum(col("d1_t") - col("e1_t")) / sum("v_t"), 6).as("chi2"))
      .withColumn("significant", col("chi2") > 3.841)
  }

  /** Floor-bucket a duration column to `binWidth`-wide bins keyed by the
    * bin lower bound: t − pmod(t, w) — pure integer arithmetic, identical
    * in any engine for the non-negative durations the contract requires.
    * binWidth = 1 keeps the original cast expression so default-parameter
    * plans (and their oracles) are untouched.
    */
  private def binnedT(durationCol: String, binWidth: Long) = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val t = col(durationCol).cast("long")
    if (binWidth == 1L) t else t - pmod(t, lit(binWidth))
  }

  def kaplanMeier(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event",
      binWidth: Long = 1L): DataFrame = {
    val byT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(binnedT(durationCol, binWidth).as("t"))
      .agg(count(lit(1)).as("n_at_t"),
        sum(col(eventCol).cast("long")).as("d_events"))
    val wRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum("n_at_t").over(wRisk))
      .withColumn("f",
        lit(1.0) - col("d_events").cast("double") / col("n_risk"))
      .withColumn("logf", round(log(col("f")), 10))
      .withColumn("survival",
        when(min("f").over(wCum) === 0.0, lit(0.0))
          .otherwise(round(exp(sum("logf").over(wCum)), 6)))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"), col("survival"))
  }
}
