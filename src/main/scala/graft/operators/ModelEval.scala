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
}
