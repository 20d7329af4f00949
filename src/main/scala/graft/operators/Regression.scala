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
    val y = col(labelCol).cast("double")
    val xs = featureCols.map(c => col(c).cast("double"))
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
      val row = df.agg(gAggs.head, gAggs.tail: _*).head()
      n = row.getLong(w.size)
      require(n > 0, "logisticGD on an empty table")
      w = Vector.tabulate(w.size)(j =>
        rnd(w(j) - lr * row.getDouble(j) / n, 7))
    }
    val sClamped = greatest(lit(1e-12), least(lit(1.0 - 1e-12), sigma))
    val metrics = df.agg(
      round(avg(-(y * log(sClamped)
        + (lit(1.0) - y) * log(lit(1.0) - sClamped))), 6).as("log_loss"),
      round(avg(when((sigma > 0.5) === (y === 1.0), 1.0).otherwise(0.0)), 6)
        .as("accuracy")).head()
    ("bias" +: featureCols).zip(w)
      .map { case (t, wv) => (t, wv, metrics.getDouble(0), metrics.getDouble(1)) }
      .toDF("term", "weight", "log_loss", "accuracy")
  }
}
