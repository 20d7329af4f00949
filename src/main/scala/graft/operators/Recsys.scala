package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collaborative-filtering training primitives. Follows the repo's
  * iterative-replay doctrine (logisticGD / bradleyTerry): fixed rounds,
  * every per-entity update one map-side-combined aggregate landing on a
  * decimal grid, state lineage-cut per round — so an independent engine
  * unrolls the training as chained CTEs and reproduces the fit exactly.
  */
object Recsys {

  /** Rank-1 alternating least squares on an explicit (user, item, rating)
    * table — the minimal matrix-factorization trainer: model r̂ = u_i·v_j,
    * alternating closed-form updates over the OBSERVED cells only,
    *
    *   u_i ← Σ_{j∈obs(i)} r_ij·v_j / Σ_{j∈obs(i)} v_j²
    *   v_j ← Σ_{i∈obs(j)} r_ij·u_i / Σ_{i∈obs(j)} u_i²
    *
    * starting from v ≡ 1 (so round 1's u is each user's mean rating —
    * deterministic, no random init to replay).
    *
    * Distributed shape: each half-round is one join of the ratings table
    * against the OTHER side's factor table (both shuffles keyed by the
    * entity id) + one map-side-combined groupBy; factors stay DataFrames
    * end-to-end — nothing corpus-sized touches the driver — and each new
    * factor table is lineage-cut (the bradleyTerry convention) so the
    * plan does not grow with rounds.
    *
    * Cross-engine determinism: factors land on the 6-dp grid after each
    * update; per-group sums ride the usual anchored-sum envelope (user
    * groups are catalog-small; item groups sum 6-dp-identical terms with
    * ~n·ε drift absorbed by the anchor). A zero denominator (an entity
    * whose partner factors are all zero) yields NULL, mirrored in the
    * oracle.
    *
    * Returns the item factors plus fit quality: (item, v, n_ratings,
    * rmse) with the final-model RMSE over observed cells repeated per
    * row (the audit-wide convention), ordered by item.
    */
  def alsRank1(
      ratings: DataFrame,
      userCol: Column,
      itemCol: Column,
      ratingCol: Column,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds in [1, 8]")
    val r = ratings.select(userCol.as("u_id"), itemCol.as("i_id"),
      ratingCol.cast("double").as("r"))
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    var v = cut(r.select(col("i_id")).distinct()
      .withColumn("v", lit(1.0)))
    var u: DataFrame = null
    for (_ <- 1 to rounds) {
      u = cut(r.join(v, Seq("i_id"))
        .groupBy("u_id")
        .agg((sum(col("r") * col("v")) / sum(col("v") * col("v")))
          .as("raw"))
        .select(col("u_id"),
          when(col("raw").isNotNull, round(col("raw"), 6)).as("u")))
      v = cut(r.join(u, Seq("u_id"))
        .groupBy("i_id")
        .agg(count(lit(1)).as("n_ratings"),
          (sum(col("r") * col("u")) / sum(col("u") * col("u"))).as("raw"))
        .select(col("i_id"), col("n_ratings"),
          when(col("raw").isNotNull, round(col("raw"), 6)).as("v")))
    }
    val rmse = broadcast(r.join(u, Seq("u_id")).join(v, Seq("i_id"))
      .agg(round(sqrt(avg((col("r") - col("u") * col("v"))
        * (col("r") - col("u") * col("v")))), 6).as("rmse")))
    v.crossJoin(rmse)
      .select(col("i_id").as("item"), col("v"), col("n_ratings"),
        col("rmse"))
      .orderBy("item")
  }
}
