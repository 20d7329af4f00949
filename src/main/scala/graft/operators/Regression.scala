package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed model fitting by fixed-round full-batch gradient descent.
  * The repo's iterative-replay doctrine applied to TRAINING: each round
  * is ONE map-side-combined aggregate over the corpus (the gradient),
  * the weight vector lives on the driver as spliced literals (the
  * k-means-centroid / kCenter precedent — p+1 doubles, corpus-size
  * independent), and both the gradient (6 dp) and the weight update
  * (7 dp) land on decimal grids so an independent engine can unroll the
  * rounds as chained CTEs and reproduce the fit bit-for-bit.
  */
object Regression {

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Multi-feature ordinary least squares by the NORMAL EQUATIONS — the
    * closed-form companion to [[logisticGD]]: one distributed pass folds
    * the corpus into the (p+1)×(p+1) Gram matrix X'X and the X'y vector
    * (bias folded in as feature 0), both 6-dp anchored; the solve is
    * driver-side Cramer's rule over those anchored sums — pure
    * determinant arithmetic, so an oracle replays it term-for-term with
    * no linear-algebra library on either side. p is small (audit-sized
    * feature sets); for wide designs you'd want a factorization, not
    * Cramer — stated, not hidden.
    *
    * A second pass computes SSE/SST against the fitted literal weights
    * for R². Returns (term, weight, r2, n) — weights 7-dp, r2 6-dp.
    */
  def olsNormal(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.size == 2,
      "olsNormal: this Cramer-rule solve is written for exactly 2 features + bias")
    val spark = df.sparkSession
    import spark.implicits._
    val y = col(labelCol).cast("double")
    val x1 = col(featureCols.head).cast("double")
    val x2 = col(featureCols(1)).cast("double")
    val m = df.agg(
      count(lit(1)).as("n"),
      round(sum(x1), 6).as("s1"), round(sum(x2), 6).as("s2"),
      round(sum(x1 * x1), 6).as("s11"), round(sum(x1 * x2), 6).as("s12"),
      round(sum(x2 * x2), 6).as("s22"),
      round(sum(y), 6).as("sy"),
      round(sum(x1 * y), 6).as("s1y"), round(sum(x2 * y), 6).as("s2y"),
      round(sum(y * y), 6).as("syy")).head()
    val n = m.getLong(0).toDouble
    require(n > 2, "olsNormal needs more rows than parameters")
    val (s1, s2, s11, s12, s22, sy, s1y, s2y, syy) =
      (m.getDouble(1), m.getDouble(2), m.getDouble(3), m.getDouble(4),
        m.getDouble(5), m.getDouble(6), m.getDouble(7), m.getDouble(8),
        m.getDouble(9))
    // Cramer over the 3x3 normal matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    require(math.abs(dd) > 1e-9, "singular design matrix")
    val w0 = rnd(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / dd, 7)
    val w1 = rnd(det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / dd, 7)
    val w2 = rnd(det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / dd, 7)
    val resid = y - (lit(w0) + lit(w1) * x1 + lit(w2) * x2)
    val fit = df.agg(
      round(sum(resid * resid), 6).as("sse")).head()
    val sst = syy - sy * sy / n
    // a constant label makes R² undefined (0/0 → NaN or -Inf depending
    // on rounding); fail loudly rather than let the engines disagree on
    // NULL-vs-NaN downstream — same doctrine as the singular-matrix guard
    require(sst > 0, "olsNormal: constant label — R2 undefined (sst = 0)")
    val r2 = rnd(1.0 - fit.getDouble(0) / sst, 6)
    Seq(("bias", w0), (featureCols.head, w1), (featureCols(1), w2))
      .map { case (t, w) => (t, w, r2, n.toLong) }
      .toDF("term", "weight", "r2", "n")
  }

  /** Logistic regression via full-batch GD: w ← round7(w − lr·g/n) with
    * g_j = round6(Σ (σ(w·x) − y)·x_j) per round (bias as feature 0).
    * Feature columns must already be anchored (standardize + round — the
    * q_feature_scale convention); label is 0/1.
    *
    * Cross-engine determinism: z = w·x is arithmetic over identical
    * doubles; exp's last-ulp libm freedom perturbs each row's σ by
    * ~1e-16, so the gradient SUM drifts ~n·1e-16 — the 6-dp gradient
    * anchor absorbs it (the survival-curve log-grid argument). σ is
    * clamped to [1e-12, 1−1e-12] before the loss logs, same CASE in any
    * engine.
    *
    * Scale shape: `rounds` passes, each one aggregate whose partial
    * state is p+2 doubles per partition; no shuffle wider than that, no
    * per-round state beyond the driver weight vector.
    *
    * Returns one row per term (bias first, then features, in order) with
    * the fitted weight, plus the final train log-loss and accuracy
    * repeated on every row (audit-style wide output; the oracle
    * replicates it).
    */
  /** Huber-loss robust simple regression by IRLS — the outlier-tolerant
    * companion to [[olsNormal]] for one feature + bias: each round
    * reweights rows by the Huber psi over the CURRENT fit's residuals,
    *
    *   ω_i = 1                 if |r_i| ≤ δ
    *       = δ / |r_i|         otherwise
    *
    * then solves the 2×2 weighted normal equations in closed form. The
    * round structure follows the logisticGD replay doctrine: weights
    * (w0, w1) live on the driver as spliced literals, each round is ONE
    * map-side-combined aggregate folding five weighted Gram sums (6-dp
    * anchored), and the Cramer solve lands on the 7-dp weight grid — so
    * an oracle unrolls rounds as chained CTEs and reproduces the fit
    * bit-for-bit. Round 0 is the unweighted OLS seed.
    *
    * Cross-engine determinism: residuals are arithmetic over spliced
    * literals (identical doubles per row); ω is a CASE over them; the
    * per-round sums take the 6-dp anchor exactly like logisticGD's
    * gradient (sum-order drift ~n·ε absorbed). δ is the caller's
    * contract, in label units.
    *
    * Returns (term, weight, frac_downweighted, n) — frac on the 6-dp
    * grid from the FINAL fit's residuals.
    */
  def huberIrls(
      df: DataFrame,
      featureCol: String,
      labelCol: String,
      delta: Double,
      rounds: Int = 2): DataFrame = {
    require(delta > 0 && rounds >= 1 && rounds <= 8,
      "delta > 0, rounds in [1, 8]")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(featureCol).cast("double")
    val y = col(labelCol).cast("double")
    def solve(sw: Double, sx: Double, sxx: Double, sy: Double,
        sxy: Double): (Double, Double) = {
      val det = sw * sxx - sx * sx
      require(math.abs(det) > 1e-9, "huberIrls: singular (constant feature)")
      (rnd((sy * sxx - sx * sxy) / det, 7), rnd((sw * sxy - sx * sy) / det, 7))
    }
    val seed = df.agg(count(lit(1)).cast("double").as("sw"),
      round(sum(x), 6).as("sx"), round(sum(x * x), 6).as("sxx"),
      round(sum(y), 6).as("sy"), round(sum(x * y), 6).as("sxy")).head()
    require(seed.getDouble(0) > 2, "huberIrls needs more rows than parameters")
    var (w0, w1) = solve(seed.getDouble(0), seed.getDouble(1),
      seed.getDouble(2), seed.getDouble(3), seed.getDouble(4))
    def residual = y - (lit(w0) + lit(w1) * x)
    def omega = when(abs(residual) <= delta, lit(1.0))
      .otherwise(lit(delta) / abs(residual))
    for (_ <- 1 to rounds) {
      val m = df.agg(round(sum(omega), 6).as("sw"),
        round(sum(omega * x), 6).as("sx"),
        round(sum(omega * x * x), 6).as("sxx"),
        round(sum(omega * y), 6).as("sy"),
        round(sum(omega * x * y), 6).as("sxy")).head()
      val next = solve(m.getDouble(0), m.getDouble(1), m.getDouble(2),
        m.getDouble(3), m.getDouble(4))
      w0 = next._1
      w1 = next._2
    }
    val fin = df.agg(count(lit(1)).as("n"),
      round(avg(when(abs(residual) > delta, 1.0).otherwise(0.0)), 6)
        .as("frac")).head()
    Seq(("bias", w0), (featureCol, w1))
      .map { case (t, w) => (t, w, fin.getDouble(1), fin.getLong(0)) }
      .toDF("term", "weight", "frac_downweighted", "n")
  }

  def logisticGD(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      rounds: Int = 8,
      lr: Double = 0.5): DataFrame = {
    require(featureCols.nonEmpty && rounds >= 1 && lr > 0,
      "need features, rounds >= 1, lr > 0")
    val spark = df.sparkSession
    import spark.implicits._
    // project to the (label, features) columns ONCE and persist: gradient
    // descent re-aggregates the corpus every round, and without the cache
    // each of the `rounds` jobs re-runs the source scan + casts behind it
    // (guide §5: persist exactly when an input is re-read per iteration).
    // Column pruning to the named columns keeps the cached footprint to
    // the feature matrix, not the source table.
    val cached = OperatorCaches.persistTracked(df.select(
      (col(labelCol).cast("double").as("__y") +:
        featureCols.zipWithIndex.map { case (c, j) =>
          col(c).cast("double").as(s"__x$j")
        }): _*))
    val y = col("__y")
    val xs = featureCols.indices.map(j => col(s"__x$j"))
    var w = Vector.fill(featureCols.size + 1)(0.0)
    def zExpr = xs.zipWithIndex
      .map { case (x, j) => lit(w(j + 1)) * x }
      .foldLeft(lit(w(0)): org.apache.spark.sql.Column)(_ + _)
    def sigma = lit(1.0) / (lit(1.0) + exp(-zExpr))
    var n = 0L
    for (_ <- 1 to rounds) {
      val gAggs = (round(sum(sigma - y), 6).as("g0") +:
        xs.zipWithIndex.map { case (x, j) =>
          round(sum((sigma - y) * x), 6).as(s"g${j + 1}")
        }) :+ count(lit(1)).as("n")
      val row = cached.agg(gAggs.head, gAggs.tail: _*).head()
      n = row.getLong(w.size)
      require(n > 0, "logisticGD on an empty table")
      w = Vector.tabulate(w.size)(j =>
        rnd(w(j) - lr * row.getDouble(j) / n, 7))
    }
    val sClamped = greatest(lit(1e-12), least(lit(1.0 - 1e-12), sigma))
    val metrics = cached.agg(
      round(avg(-(y * log(sClamped)
        + (lit(1.0) - y) * log(lit(1.0) - sClamped))), 6).as("log_loss"),
      round(avg(when((sigma > 0.5) === (y === 1.0), 1.0).otherwise(0.0)), 6)
        .as("accuracy")).head()
    ("bias" +: featureCols).zip(w)
      .map { case (t, wv) => (t, wv, metrics.getDouble(0), metrics.getDouble(1)) }
      .toDF("term", "weight", "log_loss", "accuracy")
  }
}
