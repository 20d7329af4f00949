package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TreeSplitSpec extends SparkSpec {

  test("bestSplits finds the planted boundary and ignores the noise feature") {
    import spark.implicits._
    // y jumps from 10 to 100 at good > 5; noise is uncorrelated
    val rows = (0 until 400).map { i =>
      val good = i % 10
      val noise = (i * 7) % 4
      val y = if (good > 5) 100L else 10L
      (y, good.toLong, noise.toLong)
    }
    val got = TreeSplit.bestSplits(rows.toDF("y", "good", "noise"),
      col("y"), Seq("good" -> col("good"), "noise" -> col("noise")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (gv, gnl, gnr, ggain) = got("good")
    assert(gv === 5L)
    assert(gnl === 240L && gnr === 160L)
    assert(ggain === 1.0) // the split explains ALL variance
    assert(got("noise")._4 < 0.01, "noise feature must have ~no gain")
  }

  test("bestSplits: constant label yields NULL gain_rel") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (7L, (i % 5).toLong))
    val got = TreeSplit.bestSplits(rows.toDF("y", "f"),
      col("y"), Seq("f" -> col("f"))).head()
    assert(got.isNullAt(4))
  }

  test("bestSplits gain matches a hand computation") {
    import spark.implicits._
    // y: f=0 -> {0, 2}, f=1 -> {10, 10}; split at 0:
    // SL=2,nL=2; SR=20,nR=2; ST=22,n=4
    // gain_abs = 4/2 + 400/2 - 484/4 = 2 + 200 - 121 = 81
    // SST = sum(y^2) - ST^2/n = 204 - 121 = 83 -> gain_rel = 81/83
    val rows = Seq((0L, 0L), (2L, 0L), (10L, 1L), (10L, 1L))
    val got = TreeSplit.bestSplits(rows.toDF("y", "f"),
      col("y"), Seq("f" -> col("f"))).head()
    assert(got.getLong(1) === 0L)
    assert(math.abs(got.getDouble(4) - 81.0 / 83) < 1e-6)
    assert(got.getDouble(5) === 1.0)   // mean_left
    assert(got.getDouble(6) === 10.0)  // mean_right
  }

  test("gbtStumps: round 2 fits the residuals of round 1 (planted two-feature signal)") {
    import spark.implicits._
    // y = 100*(a > 2) + 10*(b > 5): stump 1 must take feature a (bigger
    // effect), stump 2 must then recover feature b from the residuals
    val rows = (0 until 600).map { i =>
      val a = i % 6
      val b = (i / 6) % 10
      val y = (if (a > 2) 100L else 0L) + (if (b > 5) 10L else 0L)
      (y, a.toLong, b.toLong)
    }
    val got = TreeSplit.gbtStumps(rows.toDF("y", "a", "b"), col("y"),
      Seq("a" -> col("a"), "b" -> col("b")), rounds = 2, lr = 1.0)
      .collect()
    assert(got.length === 2)
    val r1 = got(0)
    assert(r1.getString(1) === "a" && r1.getLong(2) === 2L)
    // base = global mean 54; lr = 1 leaves are segment-mean offsets:
    // left 4 - 54 = -50, right 104 - 54 = +50
    assert(r1.getDouble(5) === 54.0)
    assert(r1.getDouble(3) === -50.0 && r1.getDouble(4) === 50.0)
    val r2 = got(1)
    assert(r2.getString(1) === "b" && r2.getLong(2) === 5L)
    // residuals after round 1: -4 on b<=5 (6 of 10), +6 on b>5 (4 of 10)
    assert(r2.getDouble(3) === -4.0 && r2.getDouble(4) === 6.0)
    // two stumps explain this additive signal exactly
    assert(r2.getDouble(6) === 1.0, s"train_r2 = ${r2.getDouble(6)}")
  }

  test("gbtStumps with shrinkage: leaf values scale by lr and r2 stays sub-1") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      val a = i % 4
      ((if (a > 1) 50L else 0L), a.toLong)
    }
    val got = TreeSplit.gbtStumps(rows.toDF("y", "a"), col("y"),
      Seq("a" -> col("a")), rounds = 1, lr = 0.5).head()
    // base = 25; residual segment means -25 and +25, halved by
    // shrinkage to -12.5/+12.5 -> SSE = 100·12.5² of SST = 62500:
    // r2 = 1 - 15625/62500 = 0.75 exactly
    assert(got.getDouble(5) === 25.0)
    assert(got.getDouble(3) === -12.5 && got.getDouble(4) === 12.5)
    assert(got.getDouble(6) === 0.75)
  }
}
