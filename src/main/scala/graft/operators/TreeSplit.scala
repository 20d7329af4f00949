package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-based decision-tree split finding and boosted regression
  * stumps — the core primitive of every distributed GBDT trainer
  * (XGBoost's approx tree method, LightGBM's histogram mode): fold the
  * corpus to per-(feature, bin) sufficient statistics in ONE map-side-
  * combined shuffle, then do all split arithmetic over the bounded
  * histogram, never over rows.
  *
  * BIN-FIRST CONTRACT (the AUC/isotonic convention): features must be
  * INTEGRAL BINS (quantize continuous features first — quantile or
  * fixed-width); the per-feature distinct-bin support is the memory
  * envelope, so the split search costs O(#features · #bins) whatever the
  * corpus does. Labels are integral (price in cents, counts): sums stay
  * exact BIGINTs (|Σy| and Σy² bounded by the DecimalType envelope), and
  * every gain is one identical double expression over exact integers —
  * cross-engine deterministic without tolerance.
  *
  * For squared loss, the variance gain of splitting bin prefix L from
  * suffix R needs only (count, Σy) prefixes:
  *   gain = S_L²/n_L + S_R²/n_R − S_T²/n_T      (the Σy² term cancels)
  * which is why one (cnt, sum) histogram per feature suffices.
  */
object TreeSplit {

  private val Dec = "decimal(38,0)"

  /** Best split per feature by variance gain. `features` are
    * (name, binned integral column) pairs; `labelCol` is integral.
    *
    * Shape: explode melts each row to #features (feature, bin, y)
    * triples; ONE groupBy(feature, bin) with map-side combine builds the
    * histograms; prefix windows per feature (partitions = features, rows
    * = bins — bounded by the bin contract) score every boundary; a
    * rank-1 window picks the winner (tie → smallest bin, so the argmax
    * is deterministic even between equal-gain boundaries).
    *
    * Returns one row per feature: (feature, split_v, n_left, n_right,
    * gain_rel, mean_left, mean_right) — gain_rel is the fraction of the
    * label's total sum-of-squares removed by the split (NULL for a
    * constant label), means are the left/right leaf predictions.
    */
  def bestSplits(
      df: DataFrame,
      labelCol: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "bestSplits: need >= 1 feature")
    val melted = df.select(
      labelCol.cast("long").as("y"),
      explode(array(features.map { case (n, c) =>
        struct(lit(n).as("f"), c.cast("long").as("v"))
      }: _*)).as("fv"))
      .select(col("fv.f").as("feature"), col("fv.v").as("v"), col("y"))
    val hist = melted.groupBy("feature", "v")
      .agg(count(lit(1)).as("cnt"), sum("y").as("sy"))
    val tot = df.agg(
      count(lit(1)).as("n"),
      sum(labelCol.cast("long")).as("syt"),
      sum((labelCol.cast("long") * labelCol.cast("long")).cast(Dec))
        .as("syyt"))
    val wPfx = Window.partitionBy("feature").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hist
      .withColumn("nl", sum("cnt").over(wPfx))
      .withColumn("sl", sum("sy").over(wPfx))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("n"))
      .withColumn("gain",
        col("sl").cast("double") * col("sl") / col("nl")
          + (col("syt") - col("sl")).cast("double") * (col("syt") - col("sl"))
            / (col("n") - col("nl"))
          - col("syt").cast("double") * col("syt") / col("n"))
      .withColumn("sst",
        col("syyt").cast("double")
          - col("syt").cast("double") * col("syt") / col("n"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("feature").orderBy(col("gain").desc, col("v").asc)))
      .filter(col("rk") === 1)
      .select(
        col("feature"),
        col("v").as("split_v"),
        col("nl").as("n_left"),
        (col("n") - col("nl")).as("n_right"),
        when(col("sst") > 0.0, round(col("gain") / col("sst"), 6))
          .as("gain_rel"),
        round(col("sl").cast("double") / col("nl"), 6).as("mean_left"),
        round((col("syt") - col("sl")).cast("double")
          / (col("n") - col("nl")), 6).as("mean_right"))
      .orderBy("feature")
  }

  /** Gradient-boosted regression STUMPS on squared loss: `rounds`
    * sequential depth-1 trees, each fit to the residuals of the ensemble
    * so far with shrinkage `lr` — the minimal real boosting loop, built
    * entirely from the histogram primitive above.
    *
    * Residual sums stay EXACT INTEGERS all the way to the gain: leaf
    * values live on the 7-dp grid (the logisticGD weight convention), so
    * they are stored as MICRO-UNITS (value·10⁷, a long) and the residual
    * sum over any bin decomposes into Σy·10⁷ − Σ_c n_c·predMicro_c —
    * pure DecimalType(38,0)/HUGEINT arithmetic over the per-cell
    * exact-integer (count, Σy) pairs the histogram carries (cells = the
    * ≤ 2^k regions where the ensemble is constant, enumerated on the
    * driver). Prefix and total sums run in decimal (association-free —
    * no engine's windowed-sum tree order can perturb them); ONE cast to
    * double per prefix feeds the gain, and a positive uniform scale
    * can't move an argmax, so the chosen split is bit-deterministic.
    * The per-round best split is collected to the driver (one bounded
    * row per round — the iterative-replay pacing).
    *
    * The ensemble starts from the standard GBDT base score F₀ = the
    * global label mean (snapped to the micro grid) — without it,
    * shrinkage never recovers the mean and R² is meaningless.
    *
    * Returns one row per round: (round, feature, split_v, left_value,
    * right_value, base_score, train_r2) — base_score and train_r2 (the
    * FINAL ensemble's R², computed from per-leaf-cell exact stats in
    * cell-id order) repeat audit-style.
    */
  def gbtStumps(
      df: DataFrame,
      labelCol: Column,
      features: Seq[(String, Column)],
      rounds: Int = 2,
      lr: Double = 0.5): DataFrame = {
    require(features.nonEmpty && rounds >= 1 && rounds <= 6 && lr > 0,
      "gbtStumps: need features, 1 <= rounds <= 6 (cells are 2^rounds), lr > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val featMap = features.toMap
    val y = labelCol.cast("long")
    // stumps as (feature, split, leftMicro, rightMicro): leaf values in
    // micro-units of the 7-dp grid, so ensemble predictions stay integral
    var stumps = Vector.empty[(String, Long, Long, Long)]

    // half-away-from-zero to the micro grid (matches SQL round());
    // declared before first use for the base score below
    def toMicroGrid(x: Double): Long = {
      val scaled = x * 1e7
      if (scaled >= 0) math.round(scaled) else -math.round(-scaled)
    }
    val totRow = df.agg(count(lit(1)).as("n"), sum(y).as("sy")).head()
    require(totRow.getLong(0) > 0, "gbtStumps on an empty table")
    val baseMicro = toMicroGrid(totRow.getLong(1).toDouble / totRow.getLong(0))

    def cellCol: Column = stumps.zipWithIndex
      .map { case ((f, v, _, _), k) =>
        when(featMap(f).cast("long") <= v, 1 << k).otherwise(0)
      }
      .foldLeft(lit(0))(_ + _)
    def predMicroOfCell(c: Int): Long = baseMicro + stumps.zipWithIndex
      .map { case ((_, _, li, ri), k) => if ((c & (1 << k)) != 0) li else ri }
      .sum
    def predOfCell(c: Int): Double = predMicroOfCell(c).toDouble / 1e7
    def cells: Seq[Int] = 0 until (1 << stumps.size)

    for (_ <- 1 to rounds) {
      val melted = df.select(
        y.as("y"), cellCol.as("cell"),
        explode(array(features.map { case (n, c) =>
          struct(lit(n).as("f"), c.cast("long").as("v"))
        }: _*)).as("fv"))
        .select(col("fv.f").as("feature"), col("fv.v").as("v"),
          col("y"), col("cell"))
      val aggs = count(lit(1)).as("cnt") +:
        cells.flatMap(c => Seq(
          sum(when(col("cell") === c, col("y")).otherwise(0L)).as(s"sy$c"),
          sum(when(col("cell") === c, 1L).otherwise(0L)).as(s"n$c")))
      val hist = melted.groupBy("feature", "v").agg(aggs.head, aggs.tail: _*)
      // scaled residual sum per bin: Σy·10⁷ − Σ_c n_c·predMicro_c, exact
      // decimal, folded in ascending cell order
      val rsum = cells
        .map(c => col(s"sy$c").cast(Dec) * lit(10000000L)
          - col(s"n$c").cast(Dec) * lit(predMicroOfCell(c)))
        .reduce(_ + _)
      val wPfx = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("feature")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val best = hist
        .withColumn("rs", rsum)
        .withColumn("nl", sum("cnt").over(wPfx))
        .withColumn("rl", sum("rs").over(wPfx).cast("double"))
        .withColumn("n", sum("cnt").over(wAll))
        .withColumn("rr", (sum("rs").over(wAll) - sum("rs").over(wPfx))
          .cast("double"))
        .filter(col("nl") < col("n"))
        // uniform ·10¹⁴ scale — the argmax is scale-invariant
        .withColumn("gain",
          col("rl") * col("rl") / col("nl")
            + col("rr") * col("rr") / (col("n") - col("nl"))
            - (col("rl") + col("rr")) * (col("rl") + col("rr")) / col("n"))
        .orderBy(col("gain").desc, col("feature").asc, col("v").asc)
        .limit(1)
        .select("feature", "v", "nl", "rl", "n", "rr")
        .head()
      val (f, v, nl, rl, n, rr) = (best.getString(0), best.getLong(1),
        best.getLong(2), best.getDouble(3), best.getLong(4), best.getDouble(5))
      stumps :+= ((f, v,
        toMicroGrid(lr * (rl / 1e7 / nl)),
        toMicroGrid(lr * (rr / 1e7 / (n - nl)))))
    }
    // final readout from per-leaf-cell exact stats, combined in cell order
    val fin = df.groupBy(cellCol.as("cell"))
      .agg(count(lit(1)).as("cnt"), sum(y).as("sy"),
        sum((y * y).cast(Dec)).as("syy"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toBigInteger.doubleValue))
      .sortBy(_._1)
    val nTot = fin.map(_._2).sum
    val syTot = fin.map(_._3).sum
    val sse = fin.foldLeft(0.0) { case (acc, (c, cnt, sy, syy)) =>
      val p = predOfCell(c)
      acc + (syy - 2.0 * p * sy + cnt * p * p)
    }
    val sst = fin.foldLeft(0.0) { case (acc, (_, _, _, syy)) => acc + syy } -
      syTot.toDouble * syTot / nTot
    val r2 = if (sst > 0) rnd(1.0 - sse / sst, 6) else Double.NaN
    stumps.zipWithIndex.map { case ((f, v, li, ri), i) =>
      (i + 1, f, v, li.toDouble / 1e7, ri.toDouble / 1e7,
        baseMicro.toDouble / 1e7, r2)
    }.toDF("round", "feature", "split_v", "left_value", "right_value",
      "base_score", "train_r2")
      .orderBy("round")
  }

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
}
