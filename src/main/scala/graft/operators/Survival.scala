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
    * duration — days/weeks granularity, thousands of rows at any corpus
    * size — so the unpartitioned cumulative windows over it are a
    * deliberate bounded single-partition tail, the same envelope as every
    * audit-sized output in the catalog.
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String = "duration",
      eventCol: String = "event"): DataFrame = {
    val byT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
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
