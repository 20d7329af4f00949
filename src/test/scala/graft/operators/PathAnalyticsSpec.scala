package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered-path analytics: sequential bigrams (gap bound + tie-break
  * order), multi-touch attribution (exact micro-unit credits, path
  * boundary semantics), Markov stationary flow (fixed-round grid vs the
  * closed-form fixed point), plus the two distribution tools shipped in
  * the same wave (Wasserstein-1, EB shrinkage).
  */
class PathAnalyticsSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("seqBigrams: counts ordered pairs within the gap, drops the rest") {
    import spark.implicits._
    // user 1: a(0) b(10) a(1000) — (a,b) within gap 60, (b,a) gap 990 out
    // user 2: a(0) b(5)          — one more (a,b); tie-break id unused
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(10), 2L, "b"), (1L, ts(1000), 3L, "a"),
      (2L, ts(0), 4L, "a"), (2L, ts(5), 5L, "b"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.seqBigrams(ev, col("u"), col("t"), col("id"),
        col("ty"), maxGapSec = 60L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(("a", "b") -> ((2L, 2L))))
  }

  test("seqBigrams: same-second events ordered by the id tie-break") {
    import spark.implicits._
    val ev = Seq((1L, ts(0), 2L, "b"), (1L, ts(0), 1L, "a"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.seqBigrams(ev, col("u"), col("t"), col("id"),
        col("ty"), maxGapSec = 60L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("a", "b"))) // id 1 before id 2, not file order
  }

  test("seqTrigrams: both gaps bound the path, not just the endpoints") {
    import spark.implicits._
    // a(0) b(10) c(2000): first gap ok, second gap out -> no triple
    // a(0) b(10) c(20):   both ok -> (a,b,c)
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(10), 2L, "b"), (1L, ts(2000), 3L, "c"),
      (2L, ts(0), 4L, "a"), (2L, ts(10), 5L, "b"), (2L, ts(20), 6L, "c"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.seqTrigrams(ev, col("u"), col("t"), col("id"),
        col("ty"), maxGapSec = 60L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(("a", "b", "c") -> ((1L, 1L))))
  }

  test("multiTouchAttribution: linear and U credits, path boundaries") {
    import spark.implicits._
    // user 1: 3 touches (view, click, view) then purchase then an ignored
    //         post-conversion click
    // user 2: 1 touch, converts
    // user 3: touches but never converts -> contributes nothing
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"),
      (1L, ts(20), 3L, "view"), (1L, ts(30), 4L, "purchase"),
      (1L, ts(40), 5L, "click"),
      (2L, ts(0), 6L, "click"), (2L, ts(10), 7L, "purchase"),
      (3L, ts(0), 8L, "view"), (3L, ts(10), 9L, "click"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.multiTouchAttribution(ev, col("u"), col("t"),
        col("id"), col("ty"), col("ty") === "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // user 1 linear: each of 3 touches 1/3; U: view(first) .4, click .2,
    // view(last) .4. user 2: click gets 1.0 on both models.
    val (vT, vP, vLin, vU) = got("view")
    assert(vT === 2L && vP === 1L)
    assert(math.abs(vLin - 0.666667) <= 1e-6 && math.abs(vU - 0.8) <= 1e-6)
    val (cT, cP, cLin, cU) = got("click")
    assert(cT === 2L && cP === 2L)
    assert(math.abs(cLin - 1.333333) <= 1e-6 && math.abs(cU - 1.2) <= 1e-6)
    // total credit = 2 conversions (within floor loss), non-converter gone
    assert(math.abs(got.values.map(_._3).sum - 2.0) <= 1e-5)
    assert(math.abs(got.values.map(_._4).sum - 2.0) <= 1e-5)
  }

  test("multiTouchAttribution: conversion-second tie broken by event id") {
    import spark.implicits._
    // touch and conversion share sec 10: id 2 < id 3 -> still a touch
    val ev = Seq((1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"),
      (1L, ts(10), 3L, "purchase"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.multiTouchAttribution(ev, col("u"), col("t"),
        col("id"), col("ty"), col("ty") === "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("view" -> 1L, "click" -> 1L))
  }

  test("markovStationary converges to the closed-form fixed point") {
    import spark.implicits._
    // one user, path a a b b b b a: transitions aa:1 ab:1 bb:3 ba:1
    // P(a)=(1/2,1/2), P(b)=(1/4,3/4) -> stationary (1/3, 2/3); second
    // eigenvalue 1/4 so 12 rounds land well inside the 6-dp grid
    val path = Seq("a", "a", "b", "b", "b", "b", "a")
    val ev = path.zipWithIndex.map { case (ty, i) =>
      (1L, ts(i.toLong * 10), i.toLong, ty) }.toDF("u", "t", "id", "ty")
    val got = PathAnalytics.markovStationary(ev, col("u"), col("t"),
        col("id"), col("ty"), iterations = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 1.0 / 3) <= 1e-6, got.toString)
    assert(math.abs(got("b") - 2.0 / 3) <= 1e-6, got.toString)
  }

  test("markovStationary: sink states keep their mass (still sums to 1)") {
    import spark.implicits._
    // a -> b and b has no outgoing edge: all mass drains to b
    val ev = Seq((1L, ts(0), 1L, "a"), (1L, ts(10), 2L, "b"))
      .toDF("u", "t", "id", "ty")
    val got = PathAnalytics.markovStationary(ev, col("u"), col("t"),
        col("id"), col("ty"), iterations = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 0.0 && got("b") === 1.0)
  }

  test("wasserstein1: point masses a unit apart, and the empty-slice NULL") {
    import spark.implicits._
    // A all at 0, B all at 10 -> W1 = 10 exactly, any counts
    val df = Seq((0L, 0L), (0L, 0L), (10L, 1L), (10L, 1L), (10L, 1L))
      .toDF("v", "g")
    val r = Profiling.wasserstein1(df, col("v"), col("g")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    assert(r.getDouble(3) === 10.0)
    // identical slices -> 0
    val same = Seq((5L, 0L), (5L, 1L), (7L, 0L), (7L, 1L)).toDF("v", "g")
    assert(Profiling.wasserstein1(same, col("v"), col("g"))
      .head().getDouble(3) === 0.0)
    // empty slice -> explicit NULL (undefined, not zero)
    val oneSided = Seq((5L, 0L), (7L, 0L)).toDF("v", "g")
    assert(Profiling.wasserstein1(oneSided, col("v"), col("g"))
      .head().isNullAt(3))
  }

  test("wasserstein1 matches a driver-side CDF replay on a mixed fixture") {
    import spark.implicits._
    val a = Seq(1L, 2L, 2L, 5L, 9L)
    val b = Seq(2L, 3L, 3L, 7L)
    val df = (a.map((_, 0L)) ++ b.map((_, 1L))).toDF("v", "g")
    val got = Profiling.wasserstein1(df, col("v"), col("g")).head()
    val support = (a ++ b).distinct.sorted
    val w1 = support.zip(support.tail).map { case (v, vn) =>
      val fa = a.count(_ <= v).toDouble / a.size
      val fb = b.count(_ <= v).toDouble / b.size
      math.abs(fa - fb) * (vn - v)
    }.sum
    val want = BigDecimal(w1).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(math.abs(got.getDouble(3) - want) <= 1e-6)
  }

  test("ebShrinkage pulls small-n groups toward the prior mean") {
    import spark.implicits._
    // groups: 1/1 perfect tiny group vs 70/100 strong group, against 20
    // filler groups tightly clustered near 0.5 (small rate variance ->
    // strong prior -> the tiny group gets pulled hard)
    val rows =
      Seq.fill(1)((1L, 1L)) ++
        (1 to 100).map(i => (2L, if (i <= 70) 1L else 0L)) ++
        (3 to 22).flatMap { g =>
          val succ = 22 + (g % 7) // 22..28 of 50 -> rates 0.44..0.56
          (1 to 50).map(i => (g.toLong, if (i <= succ) 1L else 0L))
        }
    val df = rows.toDF("g", "x")
    val got = Profiling.ebShrinkage(df, col("g"), col("x"), topK = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    val (n1, raw1, shrunk1) = got(1L)
    val (_, raw2, shrunk2) = got(2L)
    assert(n1 === 1L && raw1 === 1.0)
    // the 1/1 group is shrunk far harder than the 70/100 group
    assert(raw1 - shrunk1 > raw2 - shrunk2)
    // and the big group now outranks it
    assert(shrunk2 > shrunk1, s"shrunk2=$shrunk2 shrunk1=$shrunk1")
  }

  test("ebShrinkage: degenerate prior (all rates equal) yields NULL") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 0L), (2L, 1L), (2L, 0L)).toDF("g", "x")
    val got = Profiling.ebShrinkage(df, col("g"), col("x"), topK = 10)
      .collect()
    assert(got.forall(_.isNullAt(4)))
  }
}
