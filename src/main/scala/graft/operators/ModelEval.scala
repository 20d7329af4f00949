package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and distribution-drift statistics over scored /
  * labeled corpora. Both operators reduce the corpus to a GROUPED
  * support table first (one map-side-combined shuffle keyed by the
  * score/bin value), so the rank and CDF arithmetic that follows runs
  * over the bounded distinct-value support — never a global sort of
  * subjects, which is what naive rank-based implementations (ntile,
  * row_number over everything) would shuffle at 100 TB.
  */
object ModelEval {

  /** Exact ROC AUC via the Mann–Whitney rank-sum identity, with midranks
    * for ties:
    *   AUC = (sum of positive midranks - nPos(nPos+1)/2) / (nPos * nNeg)
    *
    * Distributed shape: ONE groupBy(score) with map-side combine folds
    * the corpus to (score, cnt, pos) — bounded by the score support, not
    * the subject count — and the midrank of every row sharing score s is
    * derivable from counts alone: cumLess(s) + (cnt(s)+1)/2. The
    * cumulative window therefore runs over distinct scores only.
    *
    * Cross-engine determinism: everything is INTEGER until the final
    * division — midranks are half-integers, so the sum is carried as
    * 2×midrank in BIGINT (posRankSum2). One correctly-rounded division
    * at the end, 6-dp output grid. BIGINT bounds: posRankSum2 ≤
    * 2·nPos·nSubjects ≈ 2e18 at a billion subjects — inside int64; past
    * that, swap the sum to DecimalType.
    *
    * `scoreCol` must be integral (bucket continuous scores first —
    * binned AUC is the standard large-scale form); `labelCol` is 0/1.
    * Returns one row: (n_pos, n_neg, auc).
    */
  def aucFromScores(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val byScore = df
      .groupBy(scoreCol.cast("long").as("s"))
      .agg(count(lit(1)).as("cnt"), sum(labelCol.cast("long")).as("pos"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_less", sum("cnt").over(w) - col("cnt"))
      .withColumn("midrank2", lit(2L) * col("cum_less") + col("cnt") + 1L)
      .agg(sum("pos").as("n_pos"),
        (sum("cnt") - sum("pos")).as("n_neg"),
        sum(col("pos") * col("midrank2")).as("pos_rank_sum2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("pos_rank_sum2") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double")
          / (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Isotonic calibration of a binary label against an integral score —
    * the nonparametric alternative to a sigmoid fit: the calibrated
    * probability curve is the monotone-nondecreasing least-squares fit
    * to the per-score empirical rates. Computed by the CLOSED-FORM
    * minimax characterization of the PAV solution (Barlow et al. 1972):
    *
    *   iso(k) = max_{i ≤ k} min_{j ≥ k} avg(y over scores i..j)
    *
    * rather than the sequential pool-adjacent-violators sweep — PAV's
    * data-dependent merge order doesn't replay across engines, the
    * minimax does: every interval average is an exact integer ratio, and
    * min/max are order-free.
    *
    * Distributed shape: ONE groupBy(score) pass bounds everything after
    * at the score support m (the aucFromScores envelope); the m² interval
    * table plus its two windows (per-start running tail-min, per-end max)
    * are audit-sized — bin continuous scores first, as with AUC.
    *
    * Returns (score, n, emp_rate, iso_p) ordered by score; iso_p is
    * monotone nondecreasing by construction, 6-dp output grid.
    */
  def isotonicCalibration(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column): DataFrame = {
    val byScore = df
      .groupBy(scoreCol.cast("long").as("s"))
      .agg(count(lit(1)).as("cnt"), sum(labelCol.cast("long")).as("pos"))
    val wCum = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = byScore
      .withColumn("cum_cnt", sum("cnt").over(wCum))
      .withColumn("cum_pos", sum("pos").over(wCum))
    val lo = prefix.select(col("s").as("i"),
      (col("cum_cnt") - col("cnt")).as("lo_cnt"),
      (col("cum_pos") - col("pos")).as("lo_pos"))
    val hi = prefix.select(col("s").as("j"),
      col("cum_cnt").as("hi_cnt"), col("cum_pos").as("hi_pos"))
    val pairs = lo.join(hi, col("i") <= col("j"))
      .withColumn("a", (col("hi_pos") - col("lo_pos")).cast("double")
        / (col("hi_cnt") - col("lo_cnt")))
    val wTail = Window.partitionBy("i").orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iso = pairs
      .withColumn("tail_min", min("a").over(wTail))
      .groupBy(col("j").as("s"))
      .agg(round(max("tail_min"), 6).as("iso_p"))
    byScore.join(iso, Seq("s"))
      .select(col("s").as("score"), col("cnt").as("n"),
        round(col("pos").cast("double") / col("cnt"), 6).as("emp_rate"),
        col("iso_p"))
      .orderBy("score")
  }

  /** sqrt(-ln(0.05/2)/2): the two-sample KS critical coefficient at
    * α = 0.05 — spliced as the SAME Scala-printed literal into the
    * oracle SQL (the constant-splice convention), never re-derived.
    */
  val KsCrit05: Double = math.sqrt(-math.log(0.025) / 2.0)

  /** Two-sample Kolmogorov–Smirnov statistic between group 0 and group 1
    * over a BINNED value support: D = max_b |F0(b) - F1(b)| with the
    * empirical CDFs evaluated on the shared ordered bin support. Binning
    * (the caller supplies an integral bin column) is what bounds the
    * support — raw continuous values would make the CDF window as wide
    * as the corpus; binned KS is the standard drift-monitor form and is
    * exact for the binned distributions.
    *
    * Cross-engine determinism: cumulative counts are exact integers, each
    * CDF value is one correctly-rounded division, |F0-F1| and the max are
    * order-free. Output: one row (n_a, n_b, d, d_crit, significant) with
    * d and the α=0.05 critical value d_crit = c·sqrt((n_a+n_b)/(n_a·n_b))
    * both on the 6-dp grid, compared AFTER rounding so both engines
    * decide `significant` over identical values.
    */
  def ksTest(df: DataFrame, binCol: Column, groupCol: Column): DataFrame = {
    val byBin = df
      .groupBy(binCol.cast("long").as("b"))
      .agg(sum(when(groupCol === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(groupCol === 1, 1L).otherwise(0L)).as("cb"))
    val tot = broadcast(byBin.agg(
      sum("ca").as("n_a"), sum("cb").as("n_b")))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBin.crossJoin(tot)
      .withColumn("gap",
        abs(sum("ca").over(w) / col("n_a") - sum("cb").over(w) / col("n_b")))
      .groupBy("n_a", "n_b")
      .agg(round(max("gap"), 6).as("d"))
      .withColumn("d_crit", round(lit(KsCrit05) *
        sqrt((col("n_a") + col("n_b")).cast("double")
          / (col("n_a") * col("n_b"))), 6))
      .withColumn("significant", col("d") > col("d_crit"))
  }

  /** Unbiased pass@k estimator (Chen et al. 2021, the HumanEval
    * combinatorial form) over per-task sample counts:
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)
    *
    * with k clamped to n per task and the n−c < k case pinned to 1 (too
    * few failures to fill an all-fail draw) — the product form never
    * touches factorials, so there is no overflow at any n.
    *
    * `df` is the per-task aggregate (one row per task; `nCol` samples,
    * `cCol` correct) — the corpus-sized sampling run is the caller's
    * groupBy. The product is a LEFT FOLD over i (functions.aggregate
    * here, list_reduce in the oracle) with each factor parenthesized as
    * acc·(num/den), so both engines multiply identical doubles in an
    * identical order. Returns one row: (n_tasks, k, pass_at_k).
    */
  def passAtK(df: DataFrame, nCol: Column, cCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    val n = nCol.cast("long")
    val c = cCol.cast("long")
    val kEff = least(lit(k.toLong), n)
    val prod = aggregate(sequence(lit(0L), kEff - 1L), lit(1.0),
      (acc, i) => acc * ((n - c - i).cast("double") / (n - i)))
    df.select(
        when(n - c < kEff, lit(1.0)).otherwise(lit(1.0) - prod).as("pk"))
      .agg(count(lit(1)).as("n_tasks"), round(avg("pk"), 6).as("pass_at_k"))
      .select(col("n_tasks"), lit(k).as("k"), col("pass_at_k"))
  }

  /** Split-conformal prediction interval for a point-prediction model
    * (Vovk's inductive conformal, the Lei et al. 2018 split form): the
    * calibration set supplies the order statistic
    *
    *   q̂ = the k-th smallest |y − ŷ|,  k = ⌈(n_cal + 1)(1 − α)⌉
    *
    * and the interval ŷ ± q̂ then carries a finite-sample ≥ 1−α coverage
    * guarantee on exchangeable test data. The test set here is scored
    * against q̂ to AUDIT that guarantee (empirical coverage + the fixed
    * interval width).
    *
    * Distributed shape: the calibration pass is ONE groupBy(|residual|)
    * with map-side combine — bounded by the residual support, not n_cal —
    * and the order statistic falls out of a cumulative window over that
    * support (the aucFromScores envelope); the test pass is one aggregate.
    * Bin-first contract as everywhere: `predCol`/`labelCol` are integral
    * (units), so residuals are exact BIGINTs and k is exact integer
    * arithmetic: k = ((n+1)(den−num) + den − 1) div den for α = num/den.
    *
    * Degenerate guard: k > n_cal (α too small for the calibration size)
    * yields a NULL q̂ and NULL coverage in BOTH engines rather than a
    * silent +∞ interval.
    *
    * Returns one row: (n_cal, k, qhat, n_test, covered, coverage, width);
    * coverage on the 6-dp grid, width = 2·q̂ exact.
    */
  def conformalSplit(
      cal: DataFrame,
      test: DataFrame,
      predCol: Column,
      labelCol: Column,
      alphaNum: Int,
      alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "alpha must be in (0, 1)")
    val res = abs(labelCol.cast("long") - predCol.cast("long"))
    val byRes = cal.groupBy(res.as("r")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keep = alphaDen.toLong - alphaNum.toLong
    val cum = byRes.withColumn("cum", sum("cnt").over(w))
    val tot = broadcast(cum.agg(max("cum").as("n_cal"))
      .withColumn("k", expr(
        s"((n_cal + 1) * $keep + ${alphaDen - 1}) div $alphaDen")))
    val qhat = broadcast(cum.crossJoin(tot)
      .filter(col("cum") >= col("k"))
      .groupBy("n_cal", "k").agg(min("r").as("qhat"))
      .join(tot, Seq("n_cal", "k"), "right"))
    test
      .crossJoin(qhat)
      .agg(first("n_cal").as("n_cal"), first("k").as("k"),
        first("qhat").as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(res <= col("qhat"), 1L).otherwise(0L)).as("covered"))
      .select(col("n_cal"), col("k"), col("qhat"), col("n_test"),
        when(col("qhat").isNotNull, col("covered")).as("covered"),
        when(col("qhat").isNotNull,
          round(col("covered").cast("double") / col("n_test"), 6))
          .as("coverage"),
        (lit(2L) * col("qhat")).as("width"))
  }

  /** Off-policy evaluation of a target policy from logged bandit data:
    * the inverse-propensity (IPS) and self-normalized (SNIPS) estimators
    * with weight clipping (Swaminathan & Joachims 2015):
    *
    *   w_i    = min(π(a_i|x_i) / p_i, cap)
    *   IPS    = (1/n) Σ w_i r_i          SNIPS = Σ w_i r_i / Σ w_i
    *
    * Distributed shape: embarrassingly parallel — three BIGINT sums with
    * map-side combine, one aggregate, no window, no join.
    *
    * Cross-engine determinism: propensities and rewards arrive as
    * integral UNITS (probUnits on a 1/probScale grid, rewards on their
    * own grid), and each weight is materialized on a 1/`wScale` grid by
    * FLOOR division — w_u = (target_u · wScale) div logged_u — so the
    * per-row weights, the clip (cap·wScale), and all three sums are exact
    * BIGINTs in both engines; the only floating-point ops are the two
    * final divisions. BIGINT bound: Σ w_u·r_u ≤ n · cap·wScale · maxR —
    * at n = 1e9, cap = 10, wScale = 1e4, rewards ≤ 1e4 that is 1e18,
    * inside int64; past that, lower wScale or swap to DecimalType.
    *
    * Rows with a NULL or non-positive logged propensity carry no valid
    * weight (p_i ≤ 0 means the logging policy could not have taken the
    * action) and are DROPPED — excluded from n and every sum — via an
    * explicit when() guard. Without the guard, `(t·wScale) div 0` is a
    * NULL that Spark's least() SKIPS, silently handing the row the
    * MAXIMUM capped weight while DuckDB errors on division by zero — the
    * exact cross-engine divergence the explicit-NULL doctrine exists to
    * prevent (same shape as the SNIPS-denominator guard below).
    *
    * Returns one row: (n, clipped, ips, snips) — estimates on the 6-dp
    * grid, `clipped` the count of capped weights (the diagnostic that
    * says how much mass the cap moved). n counts only valid-propensity
    * rows; an all-invalid input yields NULL ips/snips, not a crash.
    */
  def offPolicyIpsSnips(
      df: DataFrame,
      rewardUnitsCol: Column,
      loggedUnitsCol: Column,
      targetUnitsCol: Column,
      rewardScale: Long,
      cap: Long,
      wScale: Long = 10000L): DataFrame = {
    require(cap >= 1 && wScale >= 1, "cap and wScale must be positive")
    df.select(targetUnitsCol.cast("long").as("t_u"),
        loggedUnitsCol.cast("long").as("l_u"),
        rewardUnitsCol.cast("long").as("r_u"))
      .withColumn("raw_w",
        when(col("l_u") > 0L, expr(s"(t_u * $wScale) div l_u")))
      .select(when(col("raw_w").isNotNull,
          least(col("raw_w"), lit(cap * wScale))).as("w_u"), col("r_u"),
        (col("raw_w") > cap * wScale).cast("long").as("is_clipped"))
      .agg(sum(col("w_u").isNotNull.cast("long")).as("n"),
        sum("is_clipped").as("clipped"),
        sum(col("w_u") * col("r_u")).as("swr"), sum("w_u").as("sw"))
      .select(col("n"), col("clipped"),
        when(col("n") > 0L, round(col("swr").cast("double")
          / (col("n") * wScale * rewardScale), 6)).as("ips"),
        // all-zero weights (target policy never overlaps the log) would
        // divide 0/0 — explicit NULL in both engines, not an engine-
        // specific NaN/NULL split
        when(col("sw") > 0L, round(col("swr").cast("double")
          / (col("sw") * rewardScale), 6)).as("snips"))
  }

  /** z critical values spliced verbatim into the power-analysis oracle
    * (constant-splice convention): two-sided α = 0.05 and power = 0.80.
    */
  val ZAlpha05: Double = 1.959964
  val ZBeta80: Double = 0.841621

  /** A/B-test power analysis from observed arm moments: the minimum
    * detectable effect at α = 0.05 / power 0.80 for the CURRENT arm
    * sizes, and the required per-arm n to detect a 5% relative lift of
    * the control mean:
    *
    *   MDE    = (z_{α/2} + z_β) · sqrt(s_a²/n_a + s_b²/n_b)
    *   n_req  = ⌈(z_{α/2} + z_β)² · (s_a² + s_b²) / δ²⌉,  δ = 0.05·mean_a
    *
    * Distributed shape: one groupBy(arm) pass with map-side combine, then
    * arithmetic over two broadcast-sized rows. Per-arm moments are 6-dp
    * anchored BEFORE the statistic (round(avg), round(var_samp) — the
    * Welch/CUPED convention), so both engines derive MDE from identical
    * doubles and there is no Σx² overflow envelope to manage. Squares are
    * EXPLICIT products, never pow (IEEE multiply is exact; Math.pow only
    * 1-ulp).
    *
    * Returns one row: (n_a, n_b, mean_a, mde_abs, mde_rel, n_per_arm)
    * on the 6-dp grid; a zero control mean yields NULL mde_rel/n_per_arm
    * via explicit guards mirrored in the oracle.
    */
  def abPowerMde(df: DataFrame, valueCol: Column, groupCol: Column): DataFrame = {
    val zSum = ZAlpha05 + ZBeta80
    val arms = df.groupBy(groupCol.cast("long").as("g"))
      .agg(count(lit(1)).as("n"), round(avg(valueCol), 6).as("m"),
        round(var_samp(valueCol), 6).as("v"))
    val a = arms.filter(col("g") === 0L)
      .select(col("n").as("n_a"), col("m").as("mean_a"), col("v").as("var_a"))
    val b = arms.filter(col("g") === 1L)
      .select(col("n").as("n_b"), col("v").as("var_b"))
    a.crossJoin(broadcast(b))
      .withColumn("mde_abs", lit(zSum) *
        sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
      .withColumn("delta", lit(0.05) * col("mean_a"))
      .select(col("n_a"), col("n_b"), col("mean_a"),
        round(col("mde_abs"), 6).as("mde_abs"),
        when(col("mean_a") =!= 0.0,
          round(col("mde_abs") / col("mean_a"), 6)).as("mde_rel"),
        when(col("mean_a") =!= 0.0, ceil(lit(zSum * zSum) *
          (col("var_a") + col("var_b"))
          / (col("delta") * col("delta"))).cast("long")).as("n_per_arm"))
  }
}
