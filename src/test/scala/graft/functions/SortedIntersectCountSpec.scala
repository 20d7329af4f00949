package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.SortedIntersectCount

class SortedIntersectCountSpec extends SparkSpec {

  test("matches size(array_intersect) on seeded random sorted arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // duplicates included on purpose: array_intersect dedups, and the
    // two-pointer form must skip duplicate runs identically
    val rows = (1 to 400).map { i =>
      def arr(n: Int) = Array.fill(n)(rnd.nextInt(40)).sorted
      (i.toLong, arr(rnd.nextInt(12)), arr(rnd.nextInt(12)))
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        SortedIntersectCount(col("a"), col("b")).as("fused"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fused") =!= col("ref"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  test("empty sides and disjoint/superset shapes") {
    import spark.implicits._
    val df = Seq(
      (1L, Array.empty[Int], Array(1, 2, 3)),
      (2L, Array(1, 2, 3), Array.empty[Int]),
      (3L, Array(1, 2, 3), Array(4, 5, 6)),
      (4L, Array(1, 2, 3, 7, 9), Array(2, 3, 9)),
      (5L, Array(2, 2, 2), Array(2, 2))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        SortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 3, 5L -> 1))
  }

  test("null array in, null out; shared null element counts once") {
    import spark.implicits._
    // nulls sort FIRST under sort_array ascending — the contract's layout
    val df = Seq(
      (1L, null: Seq[Option[Int]], Seq(Some(1), Some(2))),
      (2L, Seq(None, Some(1), Some(3)): Seq[Option[Int]],
        Seq(None, Some(3)): Seq[Option[Int]])
    ).toDF("id", "a", "b")
    val r1 = df.filter(col("id") === 1)
      .select(SortedIntersectCount(col("a"), col("b")))
      .head()
    assert(r1.isNullAt(0))
    val r2 = df.filter(col("id") === 2)
      .select(SortedIntersectCount(col("a"), col("b")).as("fused"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .head()
    assert(r2.getInt(0) == 2 && r2.getInt(0) == r2.getInt(1))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq((Array(1, 3, 5, 7), Array(3, 4, 5, 9))).toDF("a", "b")
    // force the interpreted path through a filter on the expression value
    val viaCodegen = df.select(
      SortedIntersectCount(col("a"), col("b")).as("c")).head().getInt(0)
    assert(viaCodegen == 2)
    val expr = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1, 3, 5, 7), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3, 4, 5, 9), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)))
    assert(expr.eval(null) == 2)
  }
}
