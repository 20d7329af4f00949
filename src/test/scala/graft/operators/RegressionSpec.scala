package graft.operators

import graft.SparkSpec

class RegressionSpec extends SparkSpec {

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("logisticGD separates a linearly separable toy set") {
    import spark.implicits._
    // y = 1 iff x1 > 0; x2 is pure noise around 0
    val rows = Seq.tabulate(40) { i =>
      val x1 = if (i % 2 == 0) 1.0 else -1.0
      (x1, if (i % 4 < 2) 0.1 else -0.1, if (x1 > 0) 1L else 0L)
    }
    val out = Regression.logisticGD(
        rows.toDF("x1", "x2", "y"), Seq("x1", "x2"), "y", rounds = 8, lr = 0.5)
      .collect().map(rw => rw.getString(0) ->
        (rw.getDouble(1), rw.getDouble(2), rw.getDouble(3))).toMap
    assert(out("x1")._1 > 0.5, "separating weight is positive and large")
    assert(math.abs(out("x2")._1) < math.abs(out("x1")._1) / 3, "noise stays small")
    assert(out("bias")._3 === 1.0, "perfectly separable -> accuracy 1")
    assert(out("bias")._2 < 0.7, "log-loss improved from ln 2")
  }

  test("logisticGD matches an exact driver replay of the unrolled rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(300) {
      val x1 = r(rnd.nextGaussian(), 6)
      val x2 = r(rnd.nextGaussian(), 6)
      (x1, x2, if (x1 + 0.5 * x2 + 0.3 * rnd.nextGaussian() > 0) 1L else 0L)
    }
    val got = Regression.logisticGD(
        rows.toDF("x1", "x2", "y"), Seq("x1", "x2"), "y", rounds = 8, lr = 0.5)
      .collect().map(rw => rw.getString(0) -> rw.getDouble(1)).toMap
    var w = Vector(0.0, 0.0, 0.0)
    val n = rows.size.toDouble
    for (_ <- 1 to 8) {
      var g = Vector(0.0, 0.0, 0.0)
      rows.foreach { case (x1, x2, y) =>
        val s = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2)))
        val d = s - y
        g = Vector(g(0) + d, g(1) + d * x1, g(2) + d * x2)
      }
      val g6 = g.map(r(_, 6))
      w = Vector.tabulate(3)(j => r(w(j) - 0.5 * g6(j) / n, 7))
    }
    assert(got("bias") === w(0))
    assert(got("x1") === w(1))
    assert(got("x2") === w(2))
  }

  test("olsNormal recovers an exact linear law with r2 = 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50) {
      val x1 = r(rnd.nextGaussian(), 6)
      val x2 = r(rnd.nextGaussian(), 6)
      (x1, x2, r(2.0 + 3.0 * x1 - 1.0 * x2, 6))
    }
    val got = Regression.olsNormal(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"), "y")
      .collect().map(rw => rw.getString(0) -> (rw.getDouble(1), rw.getDouble(2))).toMap
    assert(math.abs(got("bias")._1 - 2.0) < 1e-4, got)
    assert(math.abs(got("x1")._1 - 3.0) < 1e-4, got)
    assert(math.abs(got("x2")._1 + 1.0) < 1e-4, got)
    assert(got("bias")._2 > 0.999999, "r2 = 1 on a noiseless law")
  }

  test("olsNormal matches a driver Cramer replay on noisy seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(200) {
      val x1 = r(rnd.nextGaussian(), 6)
      val x2 = r(rnd.nextGaussian(), 6)
      (x1, x2, r(1.0 + 0.5 * x1 + 2.0 * x2 + rnd.nextGaussian(), 6))
    }
    val got = Regression.olsNormal(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"), "y")
      .collect().map(rw => rw.getString(0) -> rw.getDouble(1)).toMap
    val n = rows.size.toDouble
    def s6(f: ((Double, Double, Double)) => Double) = r(rows.map(f).sum, 6)
    val (s1, s2, s11, s12, s22) = (s6(_._1), s6(_._2),
      s6(t => t._1 * t._1), s6(t => t._1 * t._2), s6(t => t._2 * t._2))
    val (sy, s1y, s2y) = (s6(_._3), s6(t => t._1 * t._3), s6(t => t._2 * t._3))
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    assert(got("bias") === r(det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / dd, 7))
    assert(got("x1") === r(det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / dd, 7))
    assert(got("x2") === r(det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / dd, 7))
  }

  test("olsNormal rejects a singular design") {
    import spark.implicits._
    // x2 = 2 * x1 exactly: collinear
    val rows = Seq.tabulate(20)(i => (i.toDouble, 2.0 * i, i * 3.0))
    intercept[IllegalArgumentException] {
      Regression.olsNormal(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"), "y")
    }
  }

  test("logisticGD rejects bad parameters and empty input") {
    import spark.implicits._
    val df = Seq((1.0, 1L)).toDF("x1", "y")
    intercept[IllegalArgumentException] {
      Regression.logisticGD(df, Seq.empty, "y")
    }
    intercept[IllegalArgumentException] {
      Regression.logisticGD(df.filter("x1 > 99"), Seq("x1"), "y")
    }
  }

  test("huberIrls: the robust fit resists outliers that drag the OLS seed") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // y = 3x + 5 + tiny noise, with 5% gross +1000 outliers
    val rows = (1 to 500).map { i =>
      val x = (i % 50 + 1).toDouble
      val noise = (rnd.nextInt(21) - 10) / 10.0
      val out = if (i % 20 == 0) 1000.0 else 0.0
      (x, 3.0 * x + 5.0 + noise + out)
    }
    val df = rows.toDF("x", "y")
    val fit = Regression.huberIrls(df, "x", "y", delta = 5.0, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // plain one-round-zero equivalent: the OLS seed over the same data
    val n = rows.size.toDouble
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(r => r._1 * r._1).sum
    val sxy = rows.map(r => r._1 * r._2).sum
    val olsSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    // the outliers drag OLS visibly; Huber stays within 0.15 of 3
    assert(math.abs(olsSlope - 3.0) > 0.5)
    assert(math.abs(fit("x") - 3.0) < 0.15, s"huber slope ${fit("x")}")
    assert(math.abs(fit("bias") - 5.0) < 3.0)
  }

  test("huberIrls matches a driver-side replay of the anchored rounds") {
    import spark.implicits._
    val rows = (1 to 80).map { i =>
      val x = (i % 10 + 1).toDouble
      (x, 2.0 * x + (if (i % 16 == 0) 50.0 else 0.0))
    }
    val got = Regression.huberIrls(rows.toDF("x", "y"), "x", "y",
        delta = 4.0, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r7(v: Double) = BigDecimal(v)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    def solve(sw: Double, sx: Double, sxx: Double, sy: Double,
        sxy: Double) = {
      val det = sw * sxx - sx * sx
      (r7((sy * sxx - sx * sxy) / det), r7((sw * sxy - sx * sy) / det))
    }
    var (b, m) = solve(rows.size.toDouble,
      r6(rows.map(_._1).sum), r6(rows.map(r => r._1 * r._1).sum),
      r6(rows.map(_._2).sum), r6(rows.map(r => r._1 * r._2).sum))
    for (_ <- 1 to 2) {
      val om = rows.map { case (x, y) =>
        val r = math.abs(y - (b + m * x))
        (x, y, if (r <= 4.0) 1.0 else 4.0 / r)
      }
      val next = solve(r6(om.map(_._3).sum),
        r6(om.map(o => o._3 * o._1).sum),
        r6(om.map(o => o._3 * o._1 * o._1).sum),
        r6(om.map(o => o._3 * o._2).sum),
        r6(om.map(o => o._3 * o._1 * o._2).sum))
      b = next._1; m = next._2
    }
    assert(math.abs(got("bias") - b) <= 1e-6)
    assert(math.abs(got("x") - m) <= 1e-6)
  }

  test("huberIrls rejects a constant feature") {
    import spark.implicits._
    val df = (1 to 10).map(i => (2.0, i.toDouble)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.huberIrls(df, "x", "y", delta = 1.0)
    }
    assert(e.getMessage.contains("singular"))
  }
}
