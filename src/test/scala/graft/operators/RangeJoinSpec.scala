package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed interval join equals the naive inequality join exactly") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(datediff(col("l_shipdate"), lit("1970-01-01")).as("ship_day"),
        col("l_orderkey"), col("l_linenumber"))
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).as("start_day"))
      .withColumn("end_day", col("start_day") + 30)

    val naive = li.join(ord,
        col("ship_day") >= col("start_day") && col("ship_day") <= col("end_day"))
      .count()
    val bucketed = RangeJoin.intervalJoin(
        li, col("ship_day"), ord, col("start_day"), col("end_day"), bucketSize = 30)
      .count()
    assert(bucketed === naive)
    assert(bucketed > 0)
  }

  test("boundary inclusivity: points exactly at start and end both match") {
    import spark.implicits._
    val pts = Seq(9L, 10L, 15L, 20L, 21L).toDF("v")
    val ivs = Seq((1L, 10L, 20L)).toDF("iv_id", "s", "e")
    val matched = RangeJoin.intervalJoin(pts, col("v"), ivs, col("s"), col("e"), 7)
      .select("v").collect().map(_.getLong(0)).sorted
    assert(matched.toSeq === Seq(10L, 15L, 20L))
  }

  test("caller columns named like the internal bucket key survive intact") {
    import spark.implicits._
    // both inputs already carry the names the implementation would want
    val pts = Seq((10L, "keep-p"), (15L, "keep-p2"))
      .toDF("v", "__graft_bucket_0")
    val ivs = Seq((1L, 10L, 20L, "keep-i")).toDF("iv_id", "s", "e", "__graft_bucket_1")
    val out = RangeJoin.intervalJoin(pts, col("v"), ivs, col("s"), col("e"), 7)
    assert(out.columns.count(_ == "__graft_bucket_0") == 1)
    assert(out.columns.count(_ == "__graft_bucket_1") == 1)
    val rows = out.orderBy("v").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("__graft_bucket_0")).toSeq == Seq("keep-p", "keep-p2"))
    assert(rows.forall(_.getAs[String]("__graft_bucket_1") == "keep-i"))
  }

  test("radiusPairs matches brute force on seeded points incl. negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // negative coordinates exercise the floor (not truncate) bucketing
    val pts = (0L until 300L).map(i =>
      (i, (rnd.nextInt(200) - 100).toLong, (rnd.nextInt(200) - 100).toLong))
    val got = RangeJoin.radiusPairs(pts.toDF("id", "x", "y"),
        col("id"), col("x"), col("y"), r = 7L)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 49L
    } yield (a._1, b._1, d2)).sortBy(p => (p._1, p._2))
    assert(got === exp)
    assert(exp.nonEmpty) // fixture sanity: the property is not vacuous
  }

  test("radiusPairs: exact-boundary pair included, one unit past excluded") {
    import spark.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 5L, 0L), (3L, 0L, 6L)).toDF("id", "x", "y")
    val got = RangeJoin.radiusPairs(pts, col("id"), col("x"), col("y"), r = 5L)
      .orderBy("id_a", "id_b").collect()
    // (1,2) at dist 5 exactly: in. (1,3) at 6: out. (2,3) at sqrt(61): out.
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(got.head.getLong(2) === 25L)
  }

  test("radiusPairs pre-flight gate fails fast with the sized diagnosis") {
    import spark.implicits._
    // 100 points in one cell: est = 9 * 100^2 = 90000
    val pts = (0L until 100L).map(i => (i, 1L, 1L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.radiusPairs(pts, col("id"), col("x"), col("y"), r = 10L,
        maxExpectedCandidates = Some(1000L))
    }
    assert(e.getMessage.contains("90000") && e.getMessage.contains("ceiling 1000"))
    // under the ceiling it runs: all C(100,2) coincident pairs at dist 0
    val ok = RangeJoin.radiusPairs(pts, col("id"), col("x"), col("y"),
      r = 10L, maxExpectedCandidates = Some(100000L))
    assert(ok.count() === 4950L)
  }

  test("intervalOverlapPairs matches the naive pairwise count across " +
      "bucket sizes (one-cell ownership: no double counting)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val iv = (0L until 120L).map { i =>
      val g = i % 3
      val s = rnd.nextInt(300).toLong
      (g, i, s, s + rnd.nextInt(40).toLong)
    }
    val df = iv.toDF("g", "id", "s", "e")
    val naive = iv.groupBy(_._1).map { case (g, xs) =>
      g -> (for {
        a <- xs; b <- xs
        if a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
      } yield 1).size.toLong
    }
    // ownership must hold for buckets smaller, comparable, and larger
    // than the interval lengths
    for (bucket <- Seq(7L, 32L, 1000L)) {
      val got = RangeJoin.intervalOverlapPairs(df, col("g"), col("id"),
          col("s"), col("e"), bucketSize = bucket, topK = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === naive, s"bucketSize=$bucket")
    }
    // the sweep twin agrees with both, pair-free
    val sweep = RangeJoin.intervalOverlapCount(df, col("g"), col("id"),
        col("s"), col("e"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sweep === naive)
  }

  test("intervalOverlapPairs pre-flight gate prices Sigma occupancy^2") {
    import spark.implicits._
    // 50 identical intervals in one bucket: est = 50^2 = 2500
    val df = (0L until 50L).map(i => (1L, i, 0L, 10L)).toDF("g", "id", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlapPairs(df, col("g"), col("id"), col("s"),
        col("e"), bucketSize = 100L, topK = 10,
        maxExpectedCandidates = Some(100L))
    }
    assert(e.getMessage.contains("2500") &&
      e.getMessage.contains("ceiling 100"), e.getMessage)
    // under the ceiling: all C(50,2) pairs overlap
    val ok = RangeJoin.intervalOverlapPairs(df, col("g"), col("id"),
      col("s"), col("e"), bucketSize = 100L, topK = 10,
      maxExpectedCandidates = Some(10000L))
    assert(ok.head().getLong(2) === 1225L)
  }

  test("intervalCoverage: sweep union length on a planted fixture") {
    import spark.implicits._
    // key 1: [0,9] [5,14] [20,20] -> covered 16, span 21
    // key 2: [3,4] nested [0,10]  -> covered 11, span 11
    val df = Seq((1L, 0L, 9L), (1L, 5L, 14L), (1L, 20L, 20L),
      (2L, 0L, 10L), (2L, 3L, 4L)).toDF("g", "s", "e")
    val got = RangeJoin.intervalCoverage(df, col("g"), col("s"), col("e"),
        topK = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 16L, 21L)))
    assert(got(2L) === ((2L, 11L, 11L)))
  }

  test("weightedMedian: half the volume, exact tie semantics") {
    import spark.implicits._
    // group 1: v=10 w=3, v=20 w=1 -> total 4, cum(10)=3, 2*3 >= 4 -> 10
    // group 2: v=10 w=1, v=20 w=1 -> exact tie 2*1 >= 2 -> lower = 10
    // group 3: v=10 w=1, v=20 w=3 -> cum(10)=1, 2 < 4 -> 20
    val df = Seq((1L, 10L, 3L), (1L, 20L, 1L), (2L, 10L, 1L),
      (2L, 20L, 1L), (3L, 10L, 1L), (3L, 20L, 3L)).toDF("g", "v", "w")
    val got = Profiling.weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 10L, 2L -> 10L, 3L -> 20L))
  }
}
