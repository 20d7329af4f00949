package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scale-shape check for the fuzzy-dedup path: a 21x-replicated corpus
  * (10.5k docs) where every replica of a base doc is a near-dup of every
  * other. LSH must recover the full clique for a long doc (deterministic:
  * every hash is seeded) through the band shuffle alone — any cartesian
  * or per-band re-evaluation pathology would blow past the suite budget
  * long before assertions fail.
  */
class DedupScaleSpec extends SparkSpec {

  test("replica cliques in a 10.5k-doc corpus: complete recall, one cluster each") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // rep 0 keeps the text; reps 1..20 append a distinct token, so within a
    // base group J(doc_i, doc_j) = L/(L+~3) — near 1 for long docs
    val reps = spark.range(21).select(col("id").as("rep"))
    val scaled = docs.crossJoin(reps).select(
      (col("doc_id") + col("rep") * 1000).as("doc_id"),
      when(col("rep") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"))
    assert(scaled.count() === 21 * 500)

    val longest = docs.orderBy(col("n_chars").desc, col("doc_id")).head().getLong(0)
    val cliqueIds = (0 until 21).map(r => longest + r * 1000L).toSet

    val pairs = Dedup.minHashLsh(scaled, threshold = 0.5)
    val cliquePairs = pairs
      .filter(col("id_a").isin(cliqueIds.toSeq: _*) && col("id_b").isin(cliqueIds.toSeq: _*))
      .count()
    assert(cliquePairs === 21L * 20L / 2L, s"clique incomplete: $cliquePairs of 210")

    // star contraction puts the whole clique in one component labeled by
    // its min id (the rep-0 original)
    val comps = Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"))
      .filter(col("id").isin(cliqueIds.toSeq: _*))
      .select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq === Seq(longest))
    OperatorCaches.releaseAll()
  }

  test("prefix-filtered ngram jaccard recovers a replica clique at 10.5k docs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val reps = spark.range(21).select(col("id").as("rep"))
    val scaled = docs.crossJoin(reps).select(
      (col("doc_id") + col("rep") * 1000).as("doc_id"),
      when(col("rep") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"))
    val longest = docs.orderBy(col("n_chars").desc, col("doc_id")).head().getLong(0)
    val cliqueIds = (0 until 21).map(r => longest + r * 1000L).toSet

    // the EXACT method must find all 210 clique pairs through the prefix
    // self-join (prefix filtering provably loses no pair at J >= t); a
    // quadratic-candidate pathology would blow the suite budget first
    val cliquePairs = Dedup.ngramJaccard(scaled, threshold = 0.6)
      .filter(col("id_a").isin(cliqueIds.toSeq: _*) &&
        col("id_b").isin(cliqueIds.toSeq: _*))
      .count()
    assert(cliquePairs === 21L * 20L / 2L, s"clique incomplete: $cliquePairs of 210")
    OperatorCaches.releaseAll()
  }
}
