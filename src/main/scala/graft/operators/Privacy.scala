package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Release-gate privacy audits over quasi-identifier partitions. The first
  * two members of the family (k-anonymity class sizes, l-diversity distinct
  * sensitive counts) are plain grouped aggregations and live directly in
  * the query catalog; t-closeness needs a real distribution distance, so it
  * gets an operator.
  */
object Privacy {

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): for each
    * quasi-identifier equivalence class, the Earth Mover's Distance between
    * the class's distribution of an ORDERED sensitive attribute and the
    * global distribution. Classes whose EMD exceeds t leak attribute
    * information even when k-anonymity and l-diversity hold (the classic
    * example: a class whose salaries are all in the global top bucket).
    *
    * For an ordered attribute with m distinct values the EMD with
    * unit-step ground distance is the normalized cumulative-difference
    * sum (the paper's Eq. for numerical attributes):
    *   EMD = (1/(m-1)) * sum_i | sum_{j<=i} (p_j - q_j) |
    * evaluated over the GLOBAL ordered support, so class-absent values
    * participate with q_j = 0.
    *
    * Cross-engine determinism: p_j and q_j are correctly-rounded ratios of
    * exact integer counts; the cumulative sum runs in the one canonical
    * order (the attribute order) in any engine, so it is bit-identical;
    * only the final per-class |·| sum is order-free (~1e-16 against the
    * 5e-7 boundary of the 6-dp output grid).
    *
    * Scale shape: one shuffle builds the class×value counts, a second
    * (tiny) derives class sizes; the global support (m rows — buckets, not
    * raw values; the caller buckets) broadcasts onto the class list, so
    * the cumulative window runs over m rows per class, never raw data.
    * Output is one row per class: bounded by the QI cardinality, the same
    * envelope as the k-anonymity audit.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitive: Column): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val qs = qiCols.map(col)
    val vals = df.select(qs :+ sensitive.cast("long").as("v"): _*)
      .filter(col("v").isNotNull)
    val classValue = OperatorCaches.persistTracked(
      vals.groupBy(qs :+ col("v"): _*).agg(count(lit(1)).as("cnt")))
    val classes = classValue.groupBy(qs: _*).agg(sum("cnt").as("n_class"))
    val global = classValue.groupBy("v").agg(sum("cnt").as("g_cnt"))
    val totals = global.agg(sum("g_cnt").as("n_total"),
      count(lit(1)).as("m_vals"))
    // grid = every class × every global support value, with zero fill for
    // class-absent values; both broadcast sides are audit-sized
    val grid = classes
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(totals))
      .join(classValue, qiCols :+ "v", "left")
      .na.fill(0L, Seq("cnt"))
    val w = Window.partitionBy(qiCols.map(col): _*).orderBy("v")
    val cum = grid.withColumn("cd",
      sum(col("cnt") / col("n_class") - col("g_cnt") / col("n_total")).over(w))
    cum.groupBy(qs :+ col("n_class"): _*)
      .agg(round(sum(abs(col("cd"))) /
        greatest(max(col("m_vals")) - 1L, lit(1L)), 6).as("emd"))
      .withColumnRenamed("n_class", "k")
  }

  /** Warner randomized response (JASA 1965) for a binary attribute, plus
    * the release-side debiasing audit: each subject reports the TRUTH
    * with probability p = pNum/pDen and the flipped bit otherwise, the
    * release sees only the reported rate λ̂, and the unbiased estimate of
    * the true proportion is
    *
    *   π̂ = (λ̂ − (1 − p)) / (2p − 1)
    *
    * The truth probability is a RATIONAL (pNum/pDen), not an ε: the
    * equivalent ε = ln(p/(1−p)) needs a transcendental neither engine
    * evaluates correctly-rounded, so the mechanism is parameterized by
    * the exact ratio and the scaladoc states the correspondence (3/4 →
    * ε = ln 3 ≈ 1.0986).
    *
    * The flip draw is the portable seeded hash ([[PortableHash]]) of the
    * subject id — mod pDen < pNum keeps the truth — so an independent
    * engine replays every per-subject coin exactly; like dpNoisyCounts,
    * the fixed draw means reproducibility covers re-runs of the SAME
    * snapshot only. Because this is an AUDIT operator the output also
    * carries the true rate and the estimator's absolute error — the
    * mechanism under test never sees them (the decontaminate-bloom-FPR
    * convention). Pure map + one aggregate: nothing here shuffles more
    * than the final single-row fold. Returns one row:
    * (n, p_truth, reported_rate, estimate, true_rate, abs_err).
    */
  def randomizedResponse(
      df: DataFrame,
      idCol: Column,
      truthCol: Column,
      pNum: Int = 3,
      pDen: Int = 4,
      seed: String = "rr"): DataFrame = {
    require(pDen > 0 && pNum > 0 && pNum < pDen, "need 0 < pNum/pDen < 1")
    require(2 * pNum != pDen, "p = 1/2 carries no signal (2p-1 = 0)")
    val keep = PortableHash.portable60(
      concat_ws(":", lit(seed), idCol.cast("string"))) % pDen < pNum
    val p = pNum.toDouble / pDen
    df.select(truthCol.cast("long").as("truth"),
        when(keep, truthCol.cast("long"))
          .otherwise(lit(1L) - truthCol.cast("long")).as("reported"))
      .agg(count(lit(1)).as("n"),
        sum("reported").as("rep_sum"), sum("truth").as("true_sum"))
      .select(col("n"), lit(p).as("p_truth"),
        round(col("rep_sum").cast("double") / col("n"), 6)
          .as("reported_rate"),
        round((col("rep_sum").cast("double") / col("n") - (1.0 - p)) /
          (2.0 * p - 1.0), 6).as("estimate"),
        round(col("true_sum").cast("double") / col("n"), 6).as("true_rate"),
        round(abs((col("rep_sum").cast("double") / col("n") - (1.0 - p)) /
          (2.0 * p - 1.0) -
          col("true_sum").cast("double") / col("n")), 6).as("abs_err"))
  }
}
