package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant, VLDB 1994 — the
  * pairwise tier of Apriori): support / confidence / lift for co-occurring
  * item pairs, the recommender / affinity-analysis member of the co-
  * occurrence family beside PMI collocations (token windows) and
  * Adamic-Adar (graph neighborhoods).
  *
  * Scale shape: baskets dedup to (basket, item) pairs, pair candidates
  * come from the posting self-join on basket — candidate volume is
  * Σ basket_size², so the levers are `maxItemDf` (items in more than
  * maxItemDf baskets are ubiquitous: their lift → 1 by construction, all
  * candidate volume and no signal — the ngramJaccard.maxDf argument,
  * reduced-set semantics an oracle replays) and `minPairCount` (pairs
  * below absolute support never leave the aggregation). Counts shuffle
  * as (item) / (item, item) keys, never baskets.
  */
object Associations {

  /** Pairwise rules over a basket table. Returns one row per unordered
    * pair (item_a < item_b) that survives both caps, with the pair count,
    * support = n_ab/N, both directed confidences, and
    * lift = n_ab·N/(n_a·n_b), all on the 6-dp grid.
    *
    * `N` counts baskets in the DEDUPED (basket, item) table that survive
    * the maxItemDf cut — reduced-set semantics: support/lift are exactly
    * those of the reduced table.
    */
  def pairRules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxItemDf: Long = Long.MaxValue): DataFrame = {
    val bi = baskets
      .select(col(basketCol).cast("long").as("b"), col(itemCol).cast("long").as("i"))
      .distinct()
    val df_ = OperatorCaches.persistTracked(
      bi.groupBy("i").agg(count(lit(1)).as("n_i"))
        .filter(col("n_i") <= maxItemDf))
    // posting rows stay (basket, item) — two longs. Item dfs join back
    // AFTER the support cut: the pair aggregate then carries only a
    // count (no first() payload widening every shuffled row), and the
    // df joins touch the ~minPairCount-surviving pairs, not the raw
    // candidate stream. The pair-candidate posting additionally applies
    // Apriori's downward closure (LOSSLESS, unlike the maxItemDf cap):
    // n_ab ≤ min(n_a, n_b), so an item in fewer than minPairCount
    // baskets cannot appear in any surviving pair — pruning it cuts
    // candidates without touching the result or the basket universe N
    // (which stays defined by the maxItemDf-capped table alone).
    val capped = OperatorCaches.persistTracked(
      bi.join(df_.select(col("i")), Seq("i"), "left_semi"))
    val nBaskets = broadcast(
      capped.select(col("b")).distinct().agg(count(lit(1)).as("__n")))
    val posting = capped.join(
      df_.filter(col("n_i") >= minPairCount).select(col("i")),
      Seq("i"), "left_semi")
    val pairs = posting.as("a").join(posting.as("b"),
        col("a.b") === col("b.b") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(df_.select(col("i").as("item_a"), col("n_i").as("n_a")), Seq("item_a"))
      .join(df_.select(col("i").as("item_b"), col("n_i").as("n_b")), Seq("item_b"))
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / col("__n").cast("double"), 6).as("support"),
        round(col("n_ab") / col("n_a").cast("double"), 6).as("conf_a_to_b"),
        round(col("n_ab") / col("n_b").cast("double"), 6).as("conf_b_to_a"),
        round(col("n_ab") * col("__n").cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }
}
