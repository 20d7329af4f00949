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
}
