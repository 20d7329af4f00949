package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.expr

class SurvivalSpec extends SparkSpec {

  private def km(rows: Seq[(Long, Int)]): Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    Survival.kaplanMeier(rows.toDF("duration", "event"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
  }

  test("no censoring: KM equals the empirical survival function") {
    // 4 subjects dying at t = 1, 2, 3, 4 -> S = 0.75, 0.5, 0.25, 0
    val got = km(Seq(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1))
    assert(got === Seq(
      (1L, 4L, 1L, 0.75), (2L, 3L, 1L, 0.5),
      (3L, 2L, 1L, 0.25), (4L, 1L, 1L, 0.0)))
  }

  test("censoring removes subjects from the risk set without an event") {
    // classic: deaths at 1 and 3; censor at 2 shrinks the risk set at 3.
    // S(1) = 1 - 1/3 = 2/3; at t=3 risk set is {3} -> S(3) = 2/3 * 0 = 0...
    // use 4 subjects so the tail stays positive:
    // (1,died)(2,censored)(3,died)(5,censored): S(1)=3/4, S(3)=3/4*(1-1/2)=3/8
    val got = km(Seq(1L -> 1, 2L -> 0, 3L -> 1, 5L -> 0))
    assert(got.map(_._1) === Seq(1L, 3L)) // censoring times emit no row
    assert(got(0) === ((1L, 4L, 1L, 0.75)))
    assert(got(1)._2 === 2L)
    assert(math.abs(got(1)._4 - 0.375) <= 1e-6)
  }

  test("a wipe-out time pins survival to exactly 0 afterwards") {
    // everyone at risk dies at t=2 (log(0) guard), nothing after
    val got = km(Seq(1L -> 1, 2L -> 1, 2L -> 1))
    assert(got(0)._4 === BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1) === ((2L, 2L, 2L, 0.0)))
  }

  test("bin-first contract: binWidth bounds a planted 1e5-distinct-t support and equals pre-binning") {
    import spark.implicits._
    // second-resolution shape: 100k subjects, every duration distinct —
    // the support a 100 TB event table would put on one window partition
    val n = 100000
    val rows = (1 to n).map(i => (i.toLong, i % 2, (i % 3) % 2))
    val df = rows.toDF("duration", "event", "g")
    val binned = Survival.kaplanMeier(df, binWidth = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // support is bounded by range/binWidth, not by the corpus
    assert(binned.length <= n / 1000 + 1, s"support not bounded: ${binned.length}")
    assert(binned.forall(_._1 % 1000 == 0), "bins must key by their lower bound")
    // binWidth is definitionally KM over the coarsened durations
    val pre = Survival.kaplanMeier(
        df.withColumn("duration", expr("duration - duration % 1000")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(binned.sortBy(_._1).toSeq === pre.sortBy(_._1).toSeq)
    // same contract on logRank: one row out, equal to the pre-binned test
    val lrBinned = Survival.logRank(df, binWidth = 1000L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val lrPre = Survival.logRank(
        df.withColumn("duration", expr("duration - duration % 1000")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(lrBinned === lrPre)
    // binWidth = 1 is the exact estimator, untouched
    val exact = Survival.kaplanMeier(df.limit(500), binWidth = 1L).collect()
    val default = Survival.kaplanMeier(df.limit(500)).collect()
    assert(exact.toSeq === default.toSeq)
  }

  test("logRank: identical groups give chi2 ~ 0; disjoint lifetimes flag") {
    import spark.implicits._
    // perfectly mirrored groups: every (duration, event) appears in both
    val mirrored = (1L to 20L).flatMap(t =>
      Seq((t, 1, 0), (t, 1, 1), (t + 5, 0, 0), (t + 5, 0, 1)))
    val r0 = Survival.logRank(mirrored.toDF("duration", "event", "g")).head()
    assert(r0.getDouble(2) < 1e-6 && !r0.getBoolean(3), r0)
    // group 1 dies uniformly much earlier -> strong separation
    val split = (1L to 30L).map(t => (t, 1, 1)) ++
      (31L to 60L).map(t => (t, 1, 0))
    val r1 = Survival.logRank(split.toDF("duration", "event", "g")).head()
    assert(r1.getDouble(2) > 3.841 && r1.getBoolean(3), r1)
  }

  test("logRank matches a brute-force per-time replay on seeded censored data") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val rows = Seq.fill(400)((1L + rnd.nextInt(25), rnd.nextInt(3) min 1,
      rnd.nextInt(2)))
    val got = Survival.logRank(rows.toDF("duration", "event", "g")).head()
    val times = rows.map(_._1).distinct.sorted
    var (sumD1, sumE1, sumV) = (0L, 0.0, 0.0)
    for (t <- times) {
      val at = rows.filter(_._1 == t)
      val dT = at.count(_._2 == 1).toLong
      if (dT > 0) {
        val nT = rows.count(_._1 >= t).toLong
        val n1T = rows.count(r => r._1 >= t && r._3 == 1).toLong
        val d1T = at.count(r => r._2 == 1 && r._3 == 1).toLong
        val frac = n1T.toDouble / nT
        sumD1 += d1T
        sumE1 += dT * frac
        sumV += dT * frac * (1.0 - frac) * (nT - dT).toDouble /
          math.max(nT - 1L, 1L)
      }
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) === sumD1)
    assert(got.getDouble(1) === r6(sumE1))
    assert(math.abs(got.getDouble(2) -
      r6((sumD1 - sumE1) * (sumD1 - sumE1) / sumV)) <= 2e-6)
  }

  test("matches a driver replay with the same log/exp grid on seeded data") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((1L + rnd.nextInt(30), rnd.nextInt(3) min 1))
    val got = km(rows)
    // replay: exact integer d/n per time, 10-dp log grid, 6-dp output
    val byT = rows.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.count(_._2 == 1).toLong)).toMap
    val times = byT.keys.toSeq.sorted
    var logAcc = 0.0
    var wiped = false
    val exp = times.flatMap { t =>
      val nRisk = rows.count(_._1 >= t).toLong
      val d = byT(t)._2
      val f = 1.0 - d.toDouble / nRisk
      if (f == 0.0) wiped = true
      else logAcc += BigDecimal(math.log(f))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      val s = if (wiped) 0.0
        else BigDecimal(math.exp(logAcc))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (d > 0) Some((t, nRisk, d, s)) else None
    }
    assert(got === exp)
  }

  test("coxPH: planted shorter group-1 lifetimes fit HR > 1, converged and significant") {
    import spark.implicits._
    // 200 subjects, interleaved event times (finite MLE): group 1 lives
    // roughly half as long; every 5th subject censored
    val rows = (0 until 200).map { i =>
      val g = i % 2
      val dur = if (g == 1) (i % 20) + 5L else (i % 40) + 10L
      (dur, if (i % 5 == 0) 0 else 1, g)
    }
    val got = Survival.coxPH(rows.toDF("duration", "event", "g")).head()
    assert(got.getLong(0) === 200L)
    assert(got.getLong(1) === 160L)
    val beta = got.getDouble(2)
    assert(beta > 0.3 && beta < 2.0, s"beta=$beta")
    assert(got.getDouble(3) > 1.5, "hazard ratio must reflect the planted effect")
    assert(got.getBoolean(6))
    // Newton converged on the 7-dp grid: a 5th round moves beta < 1e-4
    val b5 = Survival.coxPH(rows.toDF("duration", "event", "g"),
      iterations = 5).head().getDouble(2)
    assert(math.abs(b5 - beta) < 1e-4, s"not converged: $beta vs $b5")
  }

  test("coxPH: symmetric groups fit beta ~ 0 and not significant") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (((i / 2) % 30) + 5L, 1, i % 2) // identical duration law per group
    }
    val got = Survival.coxPH(rows.toDF("duration", "event", "g")).head()
    assert(math.abs(got.getDouble(2)) < 0.05)
    assert(!got.getBoolean(6))
  }

  test("coxPH: single covariate group fails loudly, not NaN") {
    import spark.implicits._
    val rows = (1 to 20).map(i => (i.toLong, 1, 1))
    val e = intercept[IllegalArgumentException] {
      Survival.coxPH(rows.toDF("duration", "event", "g"))
    }
    assert(e.getMessage.contains("degenerate"))
  }
}
