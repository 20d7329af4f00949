package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TrendSpec extends SparkSpec {

  test("cusumChangepoint locates a planted level shift exactly") {
    import spark.implicits._
    // 10 buckets at level 10, then 10 at level 50 -> split after idx 10
    val series = ((1 to 10).map(i => (i.toLong, 10L)) ++
      (11 to 20).map(i => (i.toLong, 50L))).toDF("t", "x")
    val got = Trend.cusumChangepoint(series, col("t"), col("x")).head()
    assert(got.getLong(0) === 10L) // t_hat = last bucket before the shift
    assert(got.getLong(1) === 10L)
    assert(got.getLong(2) === 20L)
    assert(got.getDouble(3) === 10.0)
    assert(got.getDouble(4) === 50.0)
    // peak |S_k| = |P_10 - (10/20)*600| = |100 - 300| = 200
    assert(got.getDouble(5) === 200.0)
  }

  test("cusumChangepoint: ties break to the smallest index") {
    import spark.implicits._
    // symmetric series: stat is symmetric, argmax must take the earliest
    val series = Seq((1L, 0L), (2L, 10L), (3L, 10L), (4L, 0L)).toDF("t", "x")
    val got = Trend.cusumChangepoint(series, col("t"), col("x")).head()
    assert(got.getLong(1) === 1L)
  }

  test("mannKendall: strictly increasing series has S = n(n-1)/2 and an increasing call") {
    import spark.implicits._
    val n = 30
    val series = (1 to n).map(i => (i.toLong, i.toLong * 2)).toDF("t", "x")
    val got = Trend.mannKendall(series, col("t"), col("x")).head()
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === n.toLong * (n - 1) / 2)
    assert(got.getBoolean(4))
    assert(got.getString(5) === "increasing")
  }

  test("mannKendall: constant series yields NULL z and trend none") {
    import spark.implicits._
    val series = (1 to 10).map(i => (i.toLong, 7L)).toDF("t", "x")
    val got = Trend.mannKendall(series, col("t"), col("x")).head()
    assert(got.getLong(1) === 0L)
    assert(got.isNullAt(3))
    assert(!got.getBoolean(4))
    assert(got.getString(5) === "none")
  }

  test("mannKendall: tie correction matches a hand computation") {
    import spark.implicits._
    // x = (1, 2, 2, 3): S = 5; ties: one group of 2 -> 2*1*9 = 18
    // Var = (4*3*13 - 18)/18 = (156-18)/18 = 138/18
    val series = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L)).toDF("t", "x")
    val got = Trend.mannKendall(series, col("t"), col("x")).head()
    assert(got.getLong(1) === 5L)
    assert(math.abs(got.getDouble(2) - 138.0 / 18) < 1e-6) // var_s rides the 6-dp grid
  }

  test("theilSen recovers a clean slope through 25% outliers") {
    import spark.implicits._
    // x = 3t + 5 with every 4th point spiked by +1000
    val series = (1 to 20).map { i =>
      val base = 3L * i + 5
      (i.toLong, if (i % 4 == 0) base + 1000 else base)
    }.toDF("t", "x")
    val got = Trend.theilSen(series, col("t"), col("x")).head()
    assert(got.getLong(0) === 20L)
    assert(got.getLong(1) === 190L)
    assert(got.getDouble(2) === 3.0)
    assert(got.getDouble(3) === 5.0)
  }

  test("theilSen rejects duplicate buckets and over-long series") {
    import spark.implicits._
    val dup = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("t", "x")
    val e = intercept[IllegalArgumentException] {
      Trend.theilSen(dup, col("t"), col("x"))
    }
    assert(e.getMessage.contains("duplicate"))
    val long = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("t", "x")
    val e2 = intercept[IllegalArgumentException] {
      Trend.theilSen(long, col("t"), col("x"), maxPoints = 50)
    }
    assert(e2.getMessage.contains("re-bin"))
  }
}
