package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lockstep spec for the native HyperplaneBands expression: bit-identical
  * band keys to (a) the interpreted HOF formulation it replaces and (b)
  * the single-long lshBucket pack it generalizes (for w·b ≤ 63, where the
  * pack is representable), plus the pinned null/empty artifacts.
  */
class HyperplaneBandsSpec extends SparkSpec {

  private def randomVecs(seed: Long, n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      i -> Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    }.toDF("id", "v")
  }

  test("native band keys equal the HOF fold bit-for-bit on random vectors") {
    val dim = 16; val w = 5; val b = 7
    val df = randomVecs(11L, 200, dim)
    val both = df.select(
      Similarity.lshBandKeys(col("v"), dim, w, b).as("native"),
      Similarity.lshBandKeysHof(col("v"), dim, w, b).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // and the keys are non-degenerate (not all rows in one bucket)
    assert(both.select(col("native")).distinct().count() > 1)
  }

  test("for w·b <= 63 the band keys are exactly the packed-bucket slices") {
    // sliced from the HOF pack, not lshBucket: since lshBucket delegates
    // to HyperplaneBands itself, slicing it here would compare the native
    // expression against itself
    val dim = 8; val w = 4; val b = 3
    val df = randomVecs(23L, 150, dim)
    val sliced = (0 until b).map(i =>
      shiftrightunsigned(Similarity.lshBucketHof(col("v"), dim, w * b), i * w)
        .bitwiseAND(lit((1L << w) - 1)))
    val both = df.select(
      Similarity.lshBandKeys(col("v"), dim, w, b).as("native"),
      array(sliced: _*).as("packed"))
    assert(both.filter(col("native") =!= col("packed")).count() === 0)
  }

  test("lshBucket (native-backed) packs bit-identically to its HOF fold") {
    for (nPlanes <- Seq(1, 16, 40, 63)) {
      val df = randomVecs(101L + nPlanes, 120, 16)
      val both = df.select(
        Similarity.lshBucket(col("v"), 16, nPlanes).as("native"),
        Similarity.lshBucketHof(col("v"), 16, nPlanes).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0,
        s"nPlanes=$nPlanes")
    }
  }

  test("beyond 63 total bits the expression still produces sane keys") {
    // the whole point of per-band keys: 22 bands of 5 bits = 110 planes,
    // impossible to pack into one long
    val dim = 16; val w = 5; val b = 22
    val df = randomVecs(37L, 100, dim)
    val keys = df.select(Similarity.lshBandKeys(col("v"), dim, w, b).as("k"))
    assert(keys.filter(size(col("k")) =!= b).count() === 0)
    assert(keys.filter(array_max(col("k")) >= (1L << w)).count() === 0)
    // matches the HOF fold out there too
    val hof = df.select(
      Similarity.lshBandKeys(col("v"), dim, w, b).as("native"),
      Similarity.lshBandKeysHof(col("v"), dim, w, b).as("hof"))
    assert(hof.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("null/null-component semantics match the HOF fold artifacts") {
    val dim = 4; val w = 3; val b = 2
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(1L, null),                         // null vector
      Row(3L, Seq[Any](0.5, null, 0.25, -1.0)), // null component: all dots null
      Row(4L, Seq(0.5, 0.25, -0.5, 1.0)))    // plain
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(col("id"), Similarity.lshBandKeys(col("v"), dim, w, b).as("k"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    assert(got(1L).isEmpty, "null vector must yield null keys")
    assert(got(3L).contains(Seq(0L, 0L)),
      s"null component nulls every dot -> no bit set; got ${got(3L)}")
    // the plain row agrees with the HOF fold
    val hof = df.filter(col("id") === 4L)
      .select(Similarity.lshBandKeysHof(col("v"), dim, w, b)).head().getSeq[Long](0)
    assert(got(4L).contains(hof.toSeq))
  }

  test("a wrong-length vector fails loudly instead of banding on partial dots") {
    // the HOF fold would null-pad into all-zero keys (silent recall
    // collapse) and the DuckDB oracle's list_dot_product would error; the
    // native expression names both lengths (round-6 advice: truncating to
    // min(len, dim) silently banded on dots no other formulation computes)
    val dim = 4; val w = 3; val b = 2
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    for (bad <- Seq(Seq(0.5, 0.25), Seq(0.5, 0.25, -0.5, 1.0, 9.0), Seq.empty[Double])) {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(1L, bad)), schema)
      val e = intercept[Exception] {
        df.select(Similarity.lshBandKeys(col("v"), dim, w, b)).collect()
      }
      def headMsg(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(headMsg(e).exists(m =>
        m.contains("vector length") && m.contains("!= dim")), headMsg(e).toString)
    }
  }

  test("the sketch plan carries the native expression, not an interpreted fold") {
    val df = randomVecs(5L, 10, 8)
    val plan = df.select(Similarity.lshBandKeys(col("v"), 8, 4, 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hyperplane_bands"), plan)
  }
}
