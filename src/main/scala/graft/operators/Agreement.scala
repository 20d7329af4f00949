package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement metrics — the quality gate in front of any
  * human- or LLM-labeled training set: raw percent agreement rewards raters
  * who spam the majority class, so label-acceptance pipelines gate on
  * CHANCE-CORRECTED agreement instead. Three standard coefficients, in
  * increasing generality: Cohen's κ (exactly two raters), Fleiss' κ (a
  * fixed panel of r raters), Krippendorff's α (variable raters per item,
  * the form crowdsourced/LLM-judge labels actually arrive in).
  *
  * Scale shape shared by all three: ONE map-side-combined groupBy folds the
  * rating log to its category-count support (|categories|² cells for κ,
  * |items| rows for Fleiss/α — the item support then folds again to a
  * handful of sufficient statistics), so nothing downstream of the first
  * shuffle scales with the corpus. Cross-engine determinism: every
  * sufficient statistic is an exact integer (DecimalType(38,0) where a
  * square of a corpus-sized count can exceed BIGINT); the coefficient is
  * one identical double expression over them, rounded to the 6-dp grid.
  */
object Agreement {

  private val Dec = "decimal(38,0)"

  /** Cohen's κ between two raters' categorical labels:
    *
    *   κ = (p_o − p_e) / (1 − p_e)
    *   p_o = Σ_k n_kk / n,   p_e = Σ_k row_k · col_k / n²
    *
    * computed as one exact-integer rational: κ = (n·Σn_kk − Σ row_k·col_k)
    * / (n² − Σ row_k·col_k), a single division of two DecimalType(38,0)
    * values (n ≲ 1e12 before n² leaves the 38-digit envelope). A
    * degenerate table with p_e = 1 (both raters constant) yields NULL κ by
    * an explicit guard, not an engine-specific division artifact.
    *
    * Returns one row: (n, po, pe, kappa).
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cm = df
      .groupBy(raterA.cast("long").as("a"), raterB.cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
    val tot = cm.agg(
      sum("c").cast(Dec).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).cast(Dec)
        .as("diag"))
    val rows = cm.groupBy("a").agg(sum("c").as("ra"))
    val cols = cm.groupBy("b").agg(sum("c").as("cb"))
    val peNum = rows
      .join(cols, col("a") === col("b"))
      .agg(coalesce(sum(col("ra").cast(Dec) * col("cb")), lit(0).cast(Dec))
        .as("pe_num"))
    tot.crossJoin(peNum)
      .select(
        col("n").cast("long").as("n"),
        round(col("diag").cast("double") / col("n").cast("double"), 6)
          .as("po"),
        round(col("pe_num").cast("double")
          / (col("n").cast("double") * col("n").cast("double")), 6)
          .as("pe"),
        when(col("n") * col("n") === col("pe_num"), lit(null).cast("double"))
          .otherwise(round(
            (col("n") * col("diag") - col("pe_num")).cast("double")
              / (col("n") * col("n") - col("pe_num")).cast("double"), 6))
          .as("kappa"))
  }

  /** Fleiss' κ for a FIXED panel: every item rated by exactly r raters
    * (long format: one row per rating). With n_ic the count of raters
    * putting item i in category c:
    *
    *   P̄  = (Σ_i Σ_c n_ic² − N·r) / (N·r·(r−1))
    *   P_e = Σ_c (Σ_i n_ic)² / (N·r)²
    *   κ   = (P̄ − P_e) / (1 − P_e)
    *
    * The fixed-panel precondition is enforced (require) from the same
    * bounded aggregate that computes the statistics — a ragged panel must
    * go to [[krippendorffAlpha]], not silently mis-normalize.
    *
    * Sufficient statistics are exact (Σn_ic² ≤ N·r² in BIGINT; the
    * category-total squares in DecimalType(38,0)); κ is one identical
    * double expression over them. Returns one row:
    * (n_items, n_raters, p_bar, p_e, kappa).
    */
  def fleissKappa(df: DataFrame, itemCol: Column, catCol: Column): DataFrame = {
    val nic = df
      .groupBy(itemCol.as("item"), catCol.cast("long").as("cat"))
      .agg(count(lit(1)).as("c"))
    val perItem = nic.groupBy("item")
      .agg(sum("c").as("m"), sum(col("c") * col("c")).as("s2i"))
    val itemStats = perItem.agg(
      count(lit(1)).as("n_items"),
      min("m").as("m_min"), max("m").as("m_max"),
      sum("s2i").as("s2"))
    val catStats = nic.groupBy("cat").agg(sum("c").as("tc"))
      .agg(sum(col("tc").cast(Dec) * col("tc")).as("sc2"))
    val st = itemStats.crossJoin(catStats).head()
    val (nItems, mMin, mMax) =
      (st.getLong(0), st.getLong(1), st.getLong(2))
    require(nItems > 0, "fleissKappa: no items")
    require(mMin == mMax,
      s"fleissKappa: ragged panel (ratings per item in [$mMin, $mMax]) — " +
        "every item must have the same rater count; use krippendorffAlpha")
    val r = mMin
    require(r >= 2, s"fleissKappa: need >= 2 raters per item, got $r")
    itemStats.crossJoin(catStats)
      .select(
        col("n_items"),
        lit(r).as("n_raters"),
        round((col("s2") - col("n_items") * lit(r)).cast("double")
          / (col("n_items") * lit(r) * lit(r - 1)).cast("double"), 6)
          .as("p_bar"),
        round(col("sc2").cast("double")
          / ((col("n_items") * lit(r)).cast(Dec)
            * (col("n_items") * lit(r))).cast("double"), 6)
          .as("p_e"),
        ((col("s2") - col("n_items") * lit(r)).cast("double")
          / (col("n_items") * lit(r) * lit(r - 1)).cast("double"))
          .as("pbar_raw"),
        (col("sc2").cast("double")
          / ((col("n_items") * lit(r)).cast(Dec)
            * (col("n_items") * lit(r))).cast("double")).as("pe_raw"))
      .select(
        col("n_items"), col("n_raters"), col("p_bar"), col("p_e"),
        when(col("pe_raw") === 1.0, lit(null).cast("double"))
          .otherwise(round((col("pbar_raw") - col("pe_raw"))
            / (lit(1.0) - col("pe_raw")), 6))
          .as("kappa"))
  }

  /** Krippendorff's α (nominal metric) over a ragged rating log — items
    * may have any number of raters; only items with ≥ 2 ratings are
    * pairable. With n_uc the ratings of unit u in category c, m_u = Σ_c
    * n_uc, n = Σ_pairable m_u, n_c the pairable category totals:
    *
    *   D_o = (1/n) · Σ_u Σ_c n_uc·(m_u − n_uc) / (m_u − 1)
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n−1))
    *   α   = 1 − D_o/D_e
    *
    * The per-unit disagreement Σ_c n_uc(m_u − n_uc) is an exact integer;
    * the 1/(m_u−1) weights are applied AFTER grouping units by m_u, so
    * the only double summation runs over the distinct-m support (panel
    * sizes — a handful of values at any corpus size; the logRank
    * bounded-support summation envelope). D_e's numerator is exact in
    * DecimalType(38,0). Returns one row:
    * (n_units, n_pairable, d_o, d_e, alpha); α is NULL when D_e = 0
    * (a single observed category — agreement is undefined, not 1).
    */
  def krippendorffAlpha(df: DataFrame, itemCol: Column, catCol: Column): DataFrame = {
    val nuc = df
      .groupBy(itemCol.as("unit"), catCol.cast("long").as("cat"))
      .agg(count(lit(1)).as("c"))
    val perUnit = nuc.groupBy("unit")
      .agg(sum("c").as("m"), sum(col("c") * col("c")).as("s2u"))
      .filter(col("m") >= 2)
    // Σ_c n_uc(m_u − n_uc) = m_u² − Σ_c n_uc², grouped by panel size m
    val byM = perUnit.groupBy("m")
      .agg(count(lit(1)).as("units"),
        sum(col("m") * col("m") - col("s2u")).as("du"))
    val doStats = byM.agg(
      sum("units").as("n_units"),
      sum(col("m") * col("units")).as("n_pair"),
      sum(col("du").cast("double") / (col("m") - 1L).cast("double"))
        .as("do_num"))
    val catTotals = nuc
      .join(perUnit.select("unit"), Seq("unit"), "left_semi")
      .groupBy("cat").agg(sum("c").as("nc"))
    val deStats = catTotals
      .crossJoin(doStats.select(col("n_pair").as("np")))
      .agg(sum(col("nc").cast(Dec) * (col("np") - col("nc"))).as("de_num"))
    doStats.crossJoin(deStats)
      .select(
        col("n_units"),
        col("n_pair").as("n_pairable"),
        round(col("do_num") / col("n_pair").cast("double"), 6).as("d_o"),
        round(col("de_num").cast("double")
          / (col("n_pair").cast(Dec) * (col("n_pair") - 1L)).cast("double"),
          6).as("d_e"),
        when(col("de_num") === 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0)
            - (col("do_num") / col("n_pair").cast("double"))
            / (col("de_num").cast("double")
              / (col("n_pair").cast(Dec) * (col("n_pair") - 1L))
                .cast("double")), 6))
          .as("alpha"))
  }
}
