package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lockstep guard for the native one-pass MinHash signature expression
  * (graftnative.MinHashSignature) against the higher-order-function
  * formulations it replaced — same contract as CosineSimilaritySpec: the
  * native codegen path must be BIT-IDENTICAL to the composed built-ins,
  * including the degenerate shapes (empty array, null array, null
  * elements), or every persisted sketch table and every DuckDB oracle
  * replaying the affine family would silently diverge.
  */
class MinHashSignatureSpec extends SparkSpec {

  private val n = 64

  private def docs = {
    import spark.implicits._
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "a b",
      4L -> "single",
      5L -> ("lorem ipsum dolor sit amet " * 40).trim)
      .toDF("doc_id", "text")
  }

  private def collectSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("xxhash64 mode is bit-identical to the HOF formulation") {
    val sh = Dedup.hashedShingles(col("text"))
    val native = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignature(sh, n)))
    val hof = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignatureHof(sh, n)))
    assert(native === hof)
    // identical docs get identical signatures; distinct docs don't
    assert(native(1L) === native(2L))
    assert(native(1L) !== native(5L))
  }

  test("portable mode is bit-identical to the HOF formulation") {
    val sh = Dedup.portableShingleHashes(col("text"))
    val native = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignaturePortable(sh, n)))
    val hof = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignaturePortableHof(sh, n)))
    assert(native === hof)
    // every portable value stays in [0, p)
    assert(native.values.flatten.forall(v => v >= 0 && v < Dedup.MinHashP))
  }

  test("interpreted eval agrees with codegen on both modes") {
    // force the interpreted path by evaluating via a fresh Projection-less
    // context: collect() under codegen vs a local relation eval with
    // codegen disabled session-wide
    val sh = Dedup.portableShingleHashes(col("text"))
    val underCodegen = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignaturePortable(sh, n)))
    val xCodegen = collectSigs(docs.select(col("doc_id"),
      Dedup.minHashSignature(Dedup.hashedShingles(col("text")), n)))
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage")
    val prevFm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = collectSigs(docs.select(col("doc_id"),
        Dedup.minHashSignaturePortable(sh, n)))
      assert(interpreted === underCodegen)
      val ix = collectSigs(docs.select(col("doc_id"),
        Dedup.minHashSignature(Dedup.hashedShingles(col("text")), n)))
      assert(ix === xCodegen)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("non-long array input fails at analysis, not execution") {
    import spark.implicits._
    val ints = Seq((1L, Seq(1, 2, 3))).toDF("id", "sh")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(org.apache.spark.sql.graftnative.MinHashSignature
        .xxhash(col("sh"), 8)).collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("degenerate inputs: HOF-matching null/empty arrays; saner null elements") {
    import spark.implicits._
    val weird = Seq(
      (1L, Seq(7L, 8L, 9L)),
      (2L, Seq.empty[Long])).toDF("id", "sh")
      .union(Seq(3L).toDF("id").select(col("id"),
        lit(null).cast("array<bigint>").as("sh")))
      .union(Seq(4L).toDF("id").select(col("id"),
        expr("array(5L, NULL, 6L)").as("sh")))
    def viaNative = weird.select(col("id"),
      org.apache.spark.sql.graftnative.MinHashSignature.xxhash(col("sh"), 8).as("sig"))
    def viaHof = weird.select(col("id"),
      array((0 until 8).map(i =>
        array_min(transform(col("sh"), h => xxhash64(h, lit(i))))): _*).as("sig"))
    val nat = viaNative.collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1).toSeq).toMap
    val hof = viaHof.collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1).toSeq).toMap
    // null-free, empty, and null ARRAYS agree with the HOF form exactly
    for (id <- Seq(1L, 2L, 3L)) assert(nat(id) === hof(id), s"id $id")
    assert(nat(2L).forall(_ == null) && nat(2L).size == 8)
    assert(nat(3L).forall(_ == null))
    // null ELEMENTS: the native expression skips them (min over the
    // non-null hashes only)...
    val expected = weird.filter(col("id") === 1)
      .select(org.apache.spark.sql.graftnative.MinHashSignature
        .xxhash(expr("array(5L, 6L)"), 8).as("sig"))
      .head().getSeq[java.lang.Long](0).toSeq
    assert(nat(4L) === expected)
    // ...whereas the HOF artifact injects a phantom candidate per family —
    // xxhash64(NULL, i) skips the null INPUT and hashes the seed chain
    // alone (hashInt(i, 42)). Pin the artifact so a change in Spark's
    // builtin surfaces here instead of silently shifting the oracle.
    val phantom = weird.filter(col("id") === 1)
      .select(array((0 until 8).map(i => least(
        xxhash64(lit(5L), lit(i)), xxhash64(lit(6L), lit(i)),
        xxhash64(lit(null).cast("bigint"), lit(i)))): _*).as("sig"))
      .head().getSeq[java.lang.Long](0).toSeq
    assert(hof(4L) === phantom)
  }
}
