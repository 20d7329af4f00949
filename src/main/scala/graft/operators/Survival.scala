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

  /** Cox proportional-hazards fit for ONE BINARY covariate (Breslow tie
    * handling, fixed-round Newton–Raphson) — the regression companion to
    * [[logRank]]: not just "do the curves differ?" but "by what hazard
    * ratio?". With the per-event-time counts d_t (events), d1_t (group-1
    * events), n1_t / n0_t (at-risk by group) and e^β =: r, the Breslow
    * partial-likelihood score and information reduce to
    *
    *   μ_t(β) = n1_t·r / (n0_t + n1_t·r)
    *   U(β)   = Σ_t [d1_t − d_t·μ_t]
    *   I(β)   = Σ_t d_t·μ_t·(1 − μ_t)
    *
    * so the WHOLE fit needs only the logRank support table — binary-
    * covariate Cox is exactly solvable from grouped counts, no per-
    * subject exp() pass.
    *
    * Iterative-replay doctrine (the logisticGD convention): β lives on
    * the driver; each Newton round is ONE two-double aggregate over the
    * persisted support with U, I anchored to the 6-dp grid, e^β snapped
    * to the 7-dp grid before splicing (libm exp is 1-ulp free), and
    * β' = β + U/I re-snapped to 7 dp — an oracle unrolls the rounds with
    * the same grids and lands on the identical β. Four rounds from β = 0
    * put Newton far past the 7-dp grid on any fixture with a real effect
    * (quadratic convergence: each round roughly doubles correct digits).
    *
    * Readout: hazard_ratio = e^β (6 dp), Wald se = 1/√I(β̂), z = β̂/se,
    * and the 5% call against the spliced z critical value. A degenerate
    * support (I = 0: no events, or a single group) fails loudly with the
    * cause named rather than emitting NaN.
    *
    * Scale shape: one groupBy(duration) pass (map-side combined longs),
    * risk sets from cumulative windows over the distinct-duration
    * support — the kaplanMeier envelope, same BIN-FIRST CONTRACT
    * (`binWidth` buckets second-resolution durations). The support is
    * cached for the rounds and released before return.
    *
    * Returns one row: (n_subjects, n_events, beta, hazard_ratio, se, z,
    * significant).
    */
  def coxPH(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event",
      groupCol: String = "g",
      binWidth: Long = 1L,
      iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "coxPH: need >= 1 Newton round")
    val spark = df.sparkSession
    import spark.implicits._
    val wRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val byT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(binnedT(durationCol, binWidth).as("t"))
      .agg(count(lit(1)).as("n_at_t"),
        sum(col(eventCol).cast("long")).as("d_t"),
        sum(when(col(groupCol) === 1, 1L).otherwise(0L)).as("n1_at_t"),
        sum(when(col(groupCol) === 1, col(eventCol).cast("long"))
          .otherwise(0L)).as("d1_t"))
      .withColumn("n1_t", sum("n1_at_t").over(wRisk))
      .withColumn("n0_t", sum("n_at_t").over(wRisk) - col("n1_t"))
      .filter(col("d_t") > 0)
      .select("t", "d_t", "d1_t", "n1_t", "n0_t")
      .cache()
    try {
      def scoreInfo(eb: Double): (Double, Double) = {
        val mu = (col("n1_t") * lit(eb)) /
          (col("n0_t") + col("n1_t") * lit(eb))
        val row = byT.agg(
          round(sum(col("d1_t") - col("d_t") * mu), 6).as("u"),
          round(sum(col("d_t") * mu * (lit(1.0) - mu)), 6).as("i")).head()
        require(!row.isNullAt(1) && row.getDouble(1) > 0.0,
          "coxPH: degenerate support — no events, or only one covariate " +
            "group ever at risk (information is 0)")
        (row.getDouble(0), row.getDouble(1))
      }
      var beta = 0.0
      for (_ <- 1 to iterations) {
        val (u, i) = scoreInfo(rnd(math.exp(beta), 7))
        beta = rnd(beta + u / i, 7)
      }
      val (_, iF) = scoreInfo(rnd(math.exp(beta), 7))
      val counts = df.filter(col(durationCol).isNotNull).agg(
        count(lit(1)).as("n"),
        sum(col(eventCol).cast("long")).as("d")).head()
      val se = rnd(1.0 / math.sqrt(iF), 6)
      val z = rnd(beta / (1.0 / math.sqrt(iF)), 6)
      Seq((counts.getLong(0), counts.getLong(1), beta,
        rnd(math.exp(beta), 6), se, z, math.abs(z) > RankEval.ZCrit05))
        .toDF("n_subjects", "n_events", "beta", "hazard_ratio", "se", "z",
          "significant")
    } finally byT.unpersist()
  }

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
}
