package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changepoint and monotone-trend statistics over a REGULAR SERIES — the
  * drift monitors that sit behind ingestion dashboards: "did the level of
  * this metric shift, and when?" (CUSUM), "is it drifting monotonically?"
  * (Mann–Kendall), "at what robust rate?" (Theil–Sen).
  *
  * SERIES CONTRACT (the bin-first convention): every member takes an
  * already-aggregated series — one row per time bucket — and its cost is a
  * function of the SERIES LENGTH, not the corpus. Callers aggregate the
  * 100 TB event log down to its daily/hourly buckets first (one map-side-
  * combined groupBy, the only full-data pass); the series that reaches
  * these operators is thousands of rows at any corpus size. CUSUM is
  * linear in the series; Mann–Kendall and Theil–Sen enumerate the
  * O(n²/2) time-ordered pairs of the BOUNDED series (≤ ~10⁴ points keeps
  * pairs ≤ ~5·10⁷ — re-bin coarser past that; both operators gate on
  * `maxPoints`).
  */
object Trend {

  private val Dec = "decimal(38,0)"

  /** Default ceiling on series length for the pairwise statistics: 20k
    * points → ≤ 2·10⁸ pairs, the edge of sensible for one non-equi join.
    */
  val DefaultMaxPoints = 20000L

  /** CUSUM changepoint locator (Page 1954 / Pettitt-style single shift):
    * with P_k the prefix sum of x and T the total over n buckets, the
    * centered cumulative sum is S_k = P_k − (k/n)·T, and the changepoint
    * estimate is the k maximizing |S_k| — the split point where the
    * mean-before / mean-after contrast is strongest.
    *
    * Exactness: S_k is scored as |n·P_k − k·T| in DecimalType(38,0) —
    * pure integer arithmetic, so the argmax (tie → smallest k) is
    * bit-deterministic in any engine; the three readout doubles
    * (mean_before, mean_after, the peak |S_k|/n) divide exact integers
    * once and round to the 6-dp grid.
    *
    * The cumulative window and row_number ride one partition — the series
    * contract above makes that a bounded tail, not a scale risk. A series
    * with n ≤ 1 returns an empty frame (no interior split exists).
    *
    * Returns one row: (t_hat, cp_idx, n, mean_before, mean_after,
    * cusum_peak) — t_hat is the LAST bucket of the before-segment.
    */
  def cusumChangepoint(series: DataFrame, tCol: Column, xCol: Column): DataFrame = {
    val s0 = series.select(tCol.as("t"), xCol.cast("long").as("x"))
    val wOrd = Window.orderBy("t")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = s0.agg(count(lit(1)).as("n"), sum("x").as("tt"))
    s0.withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("p", sum("x").over(wCum))
      .crossJoin(broadcast(tot))
      .filter(col("idx") < col("n"))
      .withColumn("stat",
        abs(col("n").cast(Dec) * col("p") - col("idx").cast(Dec) * col("tt")))
      .orderBy(col("stat").desc, col("idx").asc)
      .limit(1)
      .select(
        col("t").as("t_hat"),
        col("idx").as("cp_idx"),
        col("n"),
        round(col("p").cast("double") / col("idx").cast("double"), 6)
          .as("mean_before"),
        round((col("tt") - col("p")).cast("double")
          / (col("n") - col("idx")).cast("double"), 6).as("mean_after"),
        round(col("stat").cast("double") / col("n").cast("double"), 6)
          .as("cusum_peak"))
  }

  /** Mann–Kendall monotone-trend test: S = Σ_{i<j} sgn(x_j − x_i) over
    * time-ordered bucket pairs, with the tie-corrected variance
    *
    *   Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
    *
    * (t_g = size of each tied-x group) and the continuity-corrected
    *   z = (S∓1)/√Var(S).
    *
    * S, n, and the tie term are exact integers (DecimalType(38,0) keeps
    * n³ safe to n ≈ 10¹²); z is one identical double expression, and the
    * 5%-level call compares |z| AFTER 6-dp rounding against the spliced
    * [[RankEval.ZCrit05]]. A constant series (Var = 0) yields NULL z and
    * trend = "none" by explicit guards.
    *
    * The pair enumeration is a non-equi self-join of the bounded series
    * (broadcast nested-loop over ≤ [[DefaultMaxPoints]] rows — gated, with
    * the re-bin lever named in the failure message).
    *
    * Returns one row: (n, s, var_s, z, significant, trend).
    */
  def mannKendall(
      series: DataFrame,
      tCol: Column,
      xCol: Column,
      maxPoints: Long = DefaultMaxPoints): DataFrame = {
    val s0 = series.select(tCol.as("t"), xCol.cast("long").as("x"))
    requireBounded(s0, maxPoints, "mannKendall")
    val a = s0.select(col("t").as("ta"), col("x").as("xa"))
    val b = s0.select(col("t").as("tb"), col("x").as("xb"))
    val sAgg = a.join(b, col("ta") < col("tb"))
      .agg(coalesce(sum(signum(col("xb") - col("xa")).cast("long")), lit(0L))
        .as("s"))
    val nAgg = s0.agg(count(lit(1)).cast(Dec).as("n"))
    val tieAgg = s0.groupBy("x").agg(count(lit(1)).cast(Dec).as("tc"))
      .agg(coalesce(
        sum(col("tc") * (col("tc") - 1) * (lit(2).cast(Dec) * col("tc") + 5)),
        lit(0).cast(Dec)).as("tie_term"))
    sAgg.crossJoin(nAgg).crossJoin(tieAgg)
      .withColumn("var_raw",
        (col("n") * (col("n") - 1) * (lit(2).cast(Dec) * col("n") + 5)
          - col("tie_term")).cast("double") / 18.0)
      .withColumn("z_raw",
        when(col("var_raw") > 0.0,
          when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_raw")))
            .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("var_raw")))
            .otherwise(lit(0.0))))
      .select(
        col("n").cast("long").as("n"),
        col("s"),
        round(col("var_raw"), 6).as("var_s"),
        round(col("z_raw"), 6).as("z"),
        coalesce(abs(round(col("z_raw"), 6)) > RankEval.ZCrit05, lit(false))
          .as("significant"),
        when(coalesce(abs(round(col("z_raw"), 6)) > RankEval.ZCrit05,
            lit(false)) && col("s") > 0, "increasing")
          .when(coalesce(abs(round(col("z_raw"), 6)) > RankEval.ZCrit05,
            lit(false)) && col("s") < 0, "decreasing")
          .otherwise("none").as("trend"))
  }

  /** Theil–Sen robust slope: the MEDIAN of the pairwise slopes
    * (x_j − x_i)/(t_j − t_i) over time-ordered pairs — up to ~29%
    * outlier-contaminated buckets move it nowhere, where OLS chases every
    * spike. The intercept is the median residual x_i − slope·t_i
    * (slope snapped to the 6-dp grid BEFORE the residual pass, so both
    * engines subtract identical products).
    *
    * Each slope is one division of exact integers → identical doubles;
    * the median is avg of the two middle values of the sorted multiset
    * (tie order between equal slopes cannot move it). Both medians ride a
    * row_number over one partition of the bounded pair set — the series
    * contract. The slope and median state live on the driver between the
    * two passes (two single-row collects — the logistic-GD pacing
    * convention).
    *
    * `tCol` must be NUMERIC (a bucket index — epoch day, epoch hour);
    * duplicate t values would make a slope undefined and are rejected by
    * the same bounded aggregate that gates the length.
    *
    * Returns one row: (n_points, n_pairs, slope, intercept).
    */
  def theilSen(
      series: DataFrame,
      tCol: Column,
      xCol: Column,
      maxPoints: Long = DefaultMaxPoints): DataFrame = {
    val spark = series.sparkSession
    val s0 = series.select(tCol.cast("long").as("ti"), xCol.cast("long").as("x"))
    val chk = s0.agg(count(lit(1)).as("n"), countDistinct("ti").as("nt")).head()
    val (n, nt) = (chk.getLong(0), chk.getLong(1))
    require(n <= maxPoints,
      s"theilSen: series has $n points (> $maxPoints) — " +
        s"${n * (n - 1) / 2} pairwise slopes; re-bin to a coarser grid " +
        "or raise maxPoints")
    require(n == nt, s"theilSen: duplicate t buckets ($n rows, $nt distinct " +
      "t) — aggregate to one row per bucket first")
    require(n >= 2, s"theilSen: need >= 2 points, got $n")
    val a = s0.select(col("ti").as("ta"), col("x").as("xa"))
    val b = s0.select(col("ti").as("tb"), col("x").as("xb"))
    val pairs = a.join(b, col("ta") < col("tb"))
      .select(((col("xb") - col("xa")).cast("double")
        / (col("tb") - col("ta")).cast("double")).as("v"))
    val slope = round6(medianDouble(pairs))
    val resid = s0.select(
      (col("x").cast("double") - lit(slope) * col("ti").cast("double")).as("v"))
    val intercept = round6(medianDouble(resid))
    import spark.implicits._
    Seq((n, n * (n - 1) / 2, slope, intercept))
      .toDF("n_points", "n_pairs", "slope", "intercept")
  }

  /** Median of a single double column `v`: avg of the middle values by
    * row_number — 2·rn ∈ [m, m+2] selects exactly the one (odd m) or two
    * (even m) middle ranks in pure integer arithmetic. One bounded-
    * partition sort (the series contract).
    */
  private def medianDouble(df: DataFrame): Double = {
    val w = Window.orderBy("v")
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rn") * 2 >= col("m") && col("rn") * 2 <= col("m") + 2)
      .agg(avg("v"))
      .head().getDouble(0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def requireBounded(s0: DataFrame, maxPoints: Long, op: String): Unit = {
    val n = s0.count()
    require(n <= maxPoints,
      s"$op: series has $n points (> $maxPoints) — ${n * (n - 1) / 2} " +
        "pairs; re-bin to a coarser grid or raise maxPoints")
  }

  /** Classical additive seasonal decomposition x = trend + seasonal +
    * residual over a regular series (the "is Monday always low, or is the
    * metric drifting" splitter):
    *
    *   trend_t    = centered `period`-point moving average (odd period;
    *                NULL on the ⌊period/2⌋ edge rows — no padding lies)
    *   seasonal_k = mean of (x − trend) per phase k = t mod period,
    *                centered so Σ seasonal = 0
    *   resid_t    = x_t − trend_t − seasonal_k(t)
    *
    * SERIES CONTRACT as everywhere in this object: one row per time
    * bucket, cost a function of series length (`requireBounded`), windows
    * run on the bounded series. `tCol` a numeric bucket index (epoch
    * day), CONSECUTIVE (gaps would silently widen the moving window —
    * gap-fill first, q_timeseries_gapfill is the companion); `xCol`
    * integral units.
    *
    * Cross-engine determinism: the moving average is an exact BIGINT sum
    * with ONE division; per-phase means and the centering are double
    * reduces over the bounded series, absorbed by the 6-dp grid.
    *
    * Returns (t, x, trend, seasonal, resid) ordered by t.
    */
  def seasonalDecompose(
      series: DataFrame,
      tCol: Column,
      xCol: Column,
      period: Int = 7,
      maxPoints: Long = DefaultMaxPoints): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      "period must be odd and >= 3 (centered moving average)")
    val s0 = series.select(tCol.cast("long").as("t"), xCol.cast("long").as("x"))
    requireBounded(s0, maxPoints, "seasonalDecompose")
    val half = period / 2
    val wMa = Window.orderBy("t").rowsBetween(-half, half)
    val trended = s0
      .withColumn("win_n", count(lit(1)).over(wMa))
      .withColumn("trend",
        when(col("win_n") === period,
          sum("x").over(wMa).cast("double") / period))
      .withColumn("phase", pmod(col("t"), lit(period.toLong)))
      .withColumn("detr", col("x").cast("double") - col("trend"))
    val phases = trended.filter(col("trend").isNotNull)
      .groupBy("phase").agg(avg("detr").as("s_raw"))
    val centered = broadcast(phases
      .crossJoin(broadcast(phases.agg(avg("s_raw").as("s_mean"))))
      .select(col("phase"), (col("s_raw") - col("s_mean")).as("seasonal")))
    trended.join(centered, Seq("phase"), "left")
      .select(col("t"), col("x"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("x") - col("trend") - col("seasonal"), 6).as("resid"))
      .orderBy("t")
  }

  /** Lagged cross-correlation between two regular series (the "does the
    * marketing spike lead the purchase spike, and by how many days"
    * probe): for each lag in [-maxLag, maxLag],
    *
    *   xcorr(lag) = Pearson corr(x_t, y_{t+lag})
    *
    * over the t where both sides exist. SERIES CONTRACT: both inputs are
    * one row per bucket (the corpus-sized groupBy happened upstream);
    * the lag fan-out is (2·maxLag+1)× the BOUNDED series, then one
    * equi-join on the shifted bucket — never a cross of the corpus.
    *
    * Pearson corr is the engines' shared `corr` aggregate on the 4-dp
    * grid (the q_corr_grouped convention — corr's streaming co-moment
    * accumulation differs across engines more than plain sums, so the
    * corr family anchors at 4 dp, not 6). Lags with fewer than 3
    * overlapping points or zero variance yield NULL.
    *
    * Returns (lag, n, xcorr) ordered by lag.
    */
  def crossCorrelation(
      a: DataFrame,
      b: DataFrame,
      tColA: Column,
      xColA: Column,
      tColB: Column,
      yColB: Column,
      maxLag: Int,
      maxPoints: Long = DefaultMaxPoints): DataFrame = {
    require(maxLag >= 1 && maxLag <= 1000, "maxLag must be in [1, 1000]")
    val sa = a.select(tColA.cast("long").as("t"), xColA.cast("double").as("x"))
    val sb = b.select(tColB.cast("long").as("t"), yColB.cast("double").as("y"))
    requireBounded(sa, maxPoints, "crossCorrelation")
    // b fans into the lag join and every per-lag corr exactly like a —
    // the series contract must bind BOTH sides, not just the exploded one
    requireBounded(sb, maxPoints, "crossCorrelation")
    val lagged = sa
      .withColumn("lag",
        explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong))))
      .withColumn("t_b", col("t") + col("lag"))
    lagged.join(sb.withColumnRenamed("t", "t_b"), Seq("t_b"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        // zero-variance guard: Spark corr yields NaN where DuckDB yields
        // NULL — nullify explicitly so both engines agree on degenerates
        when(count(lit(1)) >= 3 && !isnan(corr(col("x"), col("y"))),
          round(corr(col("x"), col("y")), 4)).as("xcorr"))
      .orderBy("lag")
  }
}
