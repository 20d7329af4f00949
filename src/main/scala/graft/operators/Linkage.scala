package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the classic dirty-registry problem:
  * match corrupted entity strings back to a master table WITHOUT the
  * all-pairs edit-distance scan (quadratic, dead at any real registry
  * size). Candidates come only from equal BLOCKING KEYS (cheap
  * deterministic features of the string: length, char n-grams, suffix
  * digits); the exact Levenshtein bound then prunes within each block.
  *
  * Scale contract: cost is Σ_blocks |left_b|·|right_b| — the blocking
  * scheme is the lever. A key set too coarse (one giant block)
  * reproduces the quadratic scan; finer keys trade recall for candidate
  * volume exactly like LSH banding does. Recall is bounded by the
  * blocking: an edit that lands INSIDE a blocking key moves the record
  * to a different block and is unmatchable by construction — pick keys
  * from the string regions the corruption model does not touch.
  */
object Linkage {

  /** All candidate pairs within `maxDistance` edits, joined on the
    * conjunction of `blockKeys` (functions of the name column, applied
    * to both sides). Returns (l_id, l_name, r_id, r_name, dist).
    *
    * `maxExpectedCandidates` (opt-in, the expectedHammingCandidates
    * pattern): pre-flight Σ_blocks |left_b|·|right_b| from two cheap
    * grouped counts and fail fast with a sized diagnosis instead of
    * grinding a quadratic block — the measured failure mode at ×100 on a
    * fixed-width block key (BENCH_SF10 round-10: blocks grow linearly
    * with the registry, candidates quadratically).
    */
  def blockedFuzzyPairs(
      left: DataFrame,
      right: DataFrame,
      blockKeys: Seq[Column => Column],
      maxDistance: Int = 2,
      maxExpectedCandidates: Option[Long] = None): DataFrame = {
    require(blockKeys.nonEmpty, "blockedFuzzyPairs: need >= 1 blocking key")
    require(maxDistance >= 0, "maxDistance must be >= 0")
    val l = left.select(col("id").as("l_id"), col("name").as("l_name"))
    val r = right.select(col("id").as("r_id"), col("name").as("r_name"))
    maxExpectedCandidates.foreach { ceiling =>
      val keyNames = blockKeys.indices.map(i => s"k$i")
      def blockCounts(df: DataFrame, nameCol: String, out: String) = df
        .groupBy(blockKeys.zipWithIndex.map { case (k, i) =>
          k(col(nameCol)).as(s"k$i") }: _*)
        .agg(count(lit(1)).as(out))
      val est = blockCounts(l, "l_name", "cl")
        .join(blockCounts(r, "r_name", "cr"), keyNames)
        .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)))
        .head().getLong(0)
      require(est <= ceiling,
        s"blockedFuzzyPairs pre-flight: ~$est candidate pairs " +
          s"(Σ |left_b|·|right_b| over shared blocks; ceiling $ceiling). " +
          "Refine the blocking keys (more digits, an extra n-gram) or " +
          "lower maxDistance's recall target before joining.")
    }
    val cond = blockKeys
      .map(k => k(col("l_name")) === k(col("r_name")))
      .reduce(_ && _)
    // banded Levenshtein (threshold overload): the edit-distance loop
    // early-exits the moment a row of the DP band exceeds maxDistance and
    // returns -1 — O(maxDistance·len) per pair instead of O(len²), the
    // difference between scoring a candidate and fully aligning it. The
    // oracle's plain levenshtein() <= d filter keeps identical rows: -1
    // marks exactly the pairs the oracle's bound discards.
    l.join(r, cond)
      .withColumn("dist",
        levenshtein(col("l_name"), col("r_name"), maxDistance).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDistance)
  }

  /** One best master match per left record: rank candidates by
    * (distance, master id) — deterministic even among equal-distance
    * rivals — and keep rank 1, with the surviving candidate count
    * carried for linkage-confidence audits. Returns
    * (id, name, match_id, match_name, dist, n_candidates).
    */
  def bestMatch(
      left: DataFrame,
      right: DataFrame,
      blockKeys: Seq[Column => Column],
      maxDistance: Int = 2,
      maxExpectedCandidates: Option[Long] = None): DataFrame = {
    val pairs = blockedFuzzyPairs(left, right, blockKeys, maxDistance,
      maxExpectedCandidates)
    val w = Window.partitionBy("l_id")
      .orderBy(col("dist").asc, col("r_id").asc)
    pairs
      .withColumn("rk", row_number().over(w))
      .withColumn("n_candidates",
        count(lit(1)).over(Window.partitionBy("l_id")))
      .filter(col("rk") === 1)
      .select(col("l_id").as("id"), col("l_name").as("name"),
        col("r_id").as("match_id"), col("r_name").as("match_name"),
        col("dist"), col("n_candidates"))
  }
}
