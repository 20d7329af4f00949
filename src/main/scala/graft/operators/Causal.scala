package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Observational causal inference — the estimators a pipeline reaches for
  * when treatment was NOT randomized (the q_diff_in_diff companion for
  * cross-sectional data).
  */
object Causal {

  /** Propensity-score stratification (Rosenbaum & Rubin 1984): fit a
    * propensity model P(T=1|X) with the repo's replayable logisticGD,
    * cut the corpus into `strata` propensity bins, and average the
    * per-bin treated−control outcome gaps weighted by bin mass:
    *
    *   ATE = Σ_b (n_b / n_used) · (ȳ_{T,b} − ȳ_{C,b})
    *
    * over the bins that contain BOTH arms (single-arm bins are excluded
    * and reported via n_used — the standard overlap diagnostic).
    *
    * Distributed shape: the model fit is logisticGD's per-round single
    * aggregate; the propensity lands on the 7-dp grid, so STRATUM
    * ASSIGNMENT rides the bounded p-support (one groupBy(p) + cumulative
    * window over distinct scores — the aucFromScores envelope), never a
    * global row sort: stratum(p) = (cumBelow(p) · strata) div n. Rows
    * sharing a 7-dp propensity share a stratum by construction.
    *
    * Cross-engine determinism: weights are driver literals on the 7-dp
    * grid (logisticGD's contract), p is one fixed IEEE expression over
    * them, stratum arithmetic is exact integers, per-cell outcome means
    * are 6-dp anchored. `featureCols` must already be anchored
    * (standardize + round, the q_feature_scale convention).
    *
    * Returns one row: (n, n_used, strata_used, naive_diff, ate) — naive
    * is the unadjusted treated−control gap, kept beside the adjusted
    * number so the confounding correction is visible in-band.
    */
  def propensityStratifiedAte(
      df: DataFrame,
      featureCols: Seq[String],
      treatCol: Column,
      outcomeCol: Column,
      strata: Int = 5,
      rounds: Int = 4,
      lr: Double = 0.5): DataFrame = {
    require(strata >= 2 && strata <= 100, "strata in [2, 100]")
    val base = df.select(featureCols.map(col) ++
      Seq(treatCol.cast("long").as("__t"),
        outcomeCol.cast("double").as("__y")): _*)
    val wByTerm = Regression.logisticGD(base, featureCols, "__t", rounds, lr)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val z = featureCols.foldLeft(lit(wByTerm("bias")): Column) {
      (acc, c) => acc + lit(wByTerm(c)) * col(c)
    }
    val scored = base.withColumn("__p", round(lit(1.0) / (lit(1.0) + exp(-z)), 7))
    val byP = scored.groupBy("__p").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = byP
      .withColumn("cum_less", sum("cnt").over(wCum) - col("cnt"))
    val tot = broadcast(scored.agg(count(lit(1)).as("n")))
    val stratumOf = broadcast(withCum.crossJoin(tot)
      .withColumn("stratum", expr(s"(cum_less * $strata) div n"))
      .select("__p", "stratum"))
    val cells = scored.join(stratumOf, Seq("__p"))
      .groupBy("stratum", "__t")
      .agg(count(lit(1)).as("nc"), round(avg("__y"), 6).as("my"))
    val bins = cells.groupBy("stratum")
      .agg(sum("nc").as("n_b"),
        sum(when(col("__t") === 1, col("my"))).as("m1"),
        sum(when(col("__t") === 0, col("my"))).as("m0"),
        count(lit(1)).as("arms"))
      .filter(col("arms") === 2)
    val naive = broadcast(scored.groupBy("__t")
      .agg(round(avg("__y"), 6).as("m"))
      .agg(round(sum(when(col("__t") === 1, col("m")))
        - sum(when(col("__t") === 0, col("m"))), 6).as("naive_diff")))
    bins
      .agg(sum("n_b").as("n_used"), count(lit(1)).as("strata_used"),
        round(sum(col("n_b") * (col("m1") - col("m0"))), 6).as("wsum"))
      .crossJoin(tot).crossJoin(naive)
      .select(col("n"), col("n_used"), col("strata_used"),
        col("naive_diff"),
        round(col("wsum") / col("n_used"), 6).as("ate"))
  }
}
