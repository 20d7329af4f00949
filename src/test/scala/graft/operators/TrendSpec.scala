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

  test("seasonalDecompose recovers a planted weekly pattern on a linear trend") {
    import spark.implicits._
    // x_t = 10t + weekly bump on phase 0..6; 35 points = 5 full periods
    val bump = Array(70L, 0L, -14L, 7L, -21L, 28L, -70L) // sums to 0
    val rows = (0L until 35L).map(t => (t, 10L * t + bump((t % 7).toInt)))
    val got = Trend.seasonalDecompose(rows.toDF("t", "x"), col("t"), col("x"))
      .collect()
    // edge rows (first/last 3) have NULL trend and resid
    assert(got.take(3).forall(_.isNullAt(2)))
    assert(got.takeRight(3).forall(_.isNullAt(2)))
    // a linear trend's centered 7-point MA is exact: trend(t) = 10t
    // (the bump averages to 0 over any full window)
    val mid = got.drop(3).dropRight(3)
    assert(mid.forall(r => r.getDouble(2) === 10.0 * r.getLong(0)))
    // the seasonal index recovers the planted bump, residuals vanish
    assert(mid.forall(r =>
      r.getDouble(3) === bump((r.getLong(0) % 7).toInt).toDouble))
    assert(mid.forall(r => r.getDouble(4) === 0.0))
  }

  test("seasonalDecompose rejects even periods") {
    import spark.implicits._
    val df = Seq((0L, 1L)).toDF("t", "x")
    val e = intercept[IllegalArgumentException] {
      Trend.seasonalDecompose(df, col("t"), col("x"), period = 4)
    }
    assert(e.getMessage.contains("odd"))
  }

  test("crossCorrelation enforces the series contract on BOTH sides") {
    import spark.implicits._
    val small = (0L until 5L).map(t => (t, t.toDouble)).toDF("t", "x")
    val big = (0L until 50L).map(t => (t, t.toDouble)).toDF("t", "y")
    // an unbounded b fans into the lag join exactly like a — must trip
    val e = intercept[IllegalArgumentException] {
      Trend.crossCorrelation(small, big, col("t"), col("x"), col("t"),
        col("y"), maxLag = 2, maxPoints = 10L)
    }
    assert(e.getMessage.contains("crossCorrelation"))
  }

  test("crossCorrelation finds the planted lead and matches driver Pearson") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val x = (0L until 60L).map(t => (t, rnd.nextInt(100).toDouble))
    // y leads x by 2: y_t = x_{t-2} + noise-free copy
    val y = x.map { case (t, v) => (t + 2, v) }
    val got = Trend.crossCorrelation(x.toDF("t", "x"), y.toDF("t", "y"),
        col("t"), col("x"), col("t"), col("y"), maxLag = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    val byLag = got.map(g => g._1 -> g._3).toMap
    assert(byLag(2L) === 1.0) // exact copy at the planted lag
    assert(got.find(_._1 == 2L).get._2 === 60L)
    // driver-side Pearson at lag 0 for the replay check
    val joined = x.flatMap { case (t, v) =>
      y.toMap.get(t).map(w => (v, w)) }
    val n = joined.size.toDouble
    val (mx, my) = (joined.map(_._1).sum / n, joined.map(_._2).sum / n)
    val cov = joined.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sx = math.sqrt(joined.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(joined.map(p => (p._2 - my) * (p._2 - my)).sum)
    val exp = BigDecimal(cov / (sx * sy))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(byLag(0L) - exp) <= 1e-4 + 1e-12)
  }
}
