package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lockstep guard for the native one-pass positional gram-hash expression
  * (graftnative.GramChainHashes) against the chained-zip_with formulation
  * it replaced — including the short-document padding artifact, where a
  * fold step past the end of the token array still advances the xxhash64
  * seed chain. Every span-level operator (repeatedSpans, cutRepeatedSpans,
  * hashedShingles → every sketch) builds on these hashes, so a divergence
  * would silently shift every dedup oracle.
  */
class GramChainHashesSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "a b c",      // m == k for k=3
      3L -> "a b",        // m == k-1 (one padded fold step)
      4L -> "single",     // m == 1 (all steps padded)
      5L -> "",           // tokenizes to one empty token
      6L -> ("tok " * 80).trim,
      7L -> (null: String)) // null text → null token hashes → null output
      .toDF("doc_id", "text")
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Seq[Long]]] =
    df.collect().map(r =>
      r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toSeq)).toMap

  test("native gram chain is bit-identical to the chained zip_with fold") {
    for (k <- Seq(1, 2, 3, 5, 50)) {
      val native = collect(docs.select(col("doc_id"),
        Dedup.positionalGramHashes(col("text"), k)))
      val hof = collect(docs.select(col("doc_id"),
        Dedup.positionalGramHashesHof(col("text"), k)))
      assert(native === hof, s"k=$k")
      // position count: max(m - k + 1, 1)
      val m = 10 // doc 1 has 10 tokens
      assert(native(1L).get.size == math.max(m - k + 1, 1), s"k=$k size")
      assert(native(7L).isEmpty, "null text must stay null") // None = null output
    }
  }

  test("interpreted eval agrees with codegen") {
    val underCodegen = collect(docs.select(col("doc_id"),
      Dedup.positionalGramHashes(col("text"), 5)))
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage")
    val prevFm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = collect(docs.select(col("doc_id"),
        Dedup.positionalGramHashes(col("text"), 5)))
      assert(interpreted === underCodegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("hashedShingles (array_distinct over the chain) is unchanged") {
    // the sketch path consumes these hashes via array_distinct: pin the
    // composed form too so a change in either layer surfaces
    val native = collect(docs.select(col("doc_id"),
      Dedup.hashedShingles(col("text"), 3)))
    val viaHof = collect(docs.select(col("doc_id"),
      array_distinct(Dedup.positionalGramHashesHof(col("text"), 3))))
    assert(native === viaHof)
  }

  test("non-long array input fails at analysis") {
    import spark.implicits._
    val ints = Seq((1L, Seq(1, 2, 3))).toDF("id", "sh")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(org.apache.spark.sql.graftnative.GramChainHashes(col("sh"), 3))
        .collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }
}
