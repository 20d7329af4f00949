package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelEvalSpec extends SparkSpec {

  test("aucFromScores: perfect separation = 1, reversed = 0, random-ish in between") {
    import spark.implicits._
    val perfect = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("s", "y")
    val auc1 = ModelEval.aucFromScores(perfect, col("s"), col("y")).head()
    assert((auc1.getLong(0), auc1.getLong(1), auc1.getDouble(2)) === ((2L, 2L, 1.0)))
    val reversed = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0)).toDF("s", "y")
    assert(ModelEval.aucFromScores(reversed, col("s"), col("y"))
      .head().getDouble(2) === 0.0)
  }

  test("aucFromScores: ties get midranks — all-tied scores give AUC 0.5 exactly") {
    import spark.implicits._
    val tied = Seq((5L, 0), (5L, 0), (5L, 1), (5L, 1), (5L, 1)).toDF("s", "y")
    assert(ModelEval.aucFromScores(tied, col("s"), col("y"))
      .head().getDouble(2) === 0.5)
  }

  test("aucFromScores: matches the O(n^2) pairwise probability on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // scores correlated with labels but with heavy ties
    val rows = Seq.fill(300) {
      val y = rnd.nextInt(2)
      val s = (rnd.nextInt(8) + 3 * y).toLong
      (s, y)
    }
    val got = ModelEval.aucFromScores(rows.toDF("s", "y"), col("s"), col("y"))
      .head().getDouble(2)
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val exp = BigDecimal(wins / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - exp) <= 1e-6 + 1e-12, s"got $got exp $exp")
  }

  test("aucFromScores is invariant under strictly monotone score transforms") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(200)(((rnd.nextInt(40) + 1).toLong, rnd.nextInt(2)))
    val base = ModelEval.aucFromScores(rows.toDF("s", "y"), col("s"), col("y"))
      .head().getDouble(2)
    // rank statistics see only the ordering: affine and cubic transforms
    // of the score leave the AUC bit-identical
    val affine = ModelEval.aucFromScores(
      rows.map { case (s, y) => (s * 7 + 3, y) }.toDF("s", "y"),
      col("s"), col("y")).head().getDouble(2)
    val cubic = ModelEval.aucFromScores(
      rows.map { case (s, y) => (s * s * s, y) }.toDF("s", "y"),
      col("s"), col("y")).head().getDouble(2)
    assert(affine === base && cubic === base)
  }

  test("isotonicCalibration: already-monotone rates pass through; violations pool") {
    import spark.implicits._
    // monotone case: rates 0/2, 1/2, 2/2 by score
    val mono = Seq((1L, 0), (1L, 0), (2L, 0), (2L, 1), (3L, 1), (3L, 1))
    val gotM = ModelEval.isotonicCalibration(mono.toDF("s", "y"), col("s"), col("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(gotM.toSeq === Seq((1L, 0.0), (2L, 0.5), (3L, 1.0)))
    // violation: scores 1,2 have rates 1.0 then 0.0 -> pool to 0.5
    val viol = Seq((1L, 1), (2L, 0), (3L, 1))
    val gotV = ModelEval.isotonicCalibration(viol.toDF("s", "y"), col("s"), col("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(gotV.toSeq === Seq((1L, 0.5), (2L, 0.5), (3L, 1.0)))
  }

  test("isotonicCalibration matches a sequential PAV sweep on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(500) {
      val s = (rnd.nextInt(15) + 1).toLong
      // conversion probability grows with score, with noise
      (s, if (rnd.nextDouble() < s / 20.0) 1 else 0)
    }
    val got = ModelEval.isotonicCalibration(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // classic PAV: pool adjacent violating blocks to their weighted mean
    case class Blk(var sum: Double, var n: Long, var scores: List[Long])
    val ordered = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, g) => Blk(g.count(_._2 == 1).toDouble, g.size.toLong, List(s)) }
    val stack = scala.collection.mutable.Stack[Blk]()
    for (b <- ordered) {
      stack.push(b)
      while (stack.size > 1 && {
        val top = stack(0); val below = stack(1)
        below.sum / below.n >= top.sum / top.n
      }) {
        val top = stack.pop(); val below = stack.pop()
        stack.push(Blk(top.sum + below.sum, top.n + below.n,
          below.scores ++ top.scores))
      }
    }
    val exp = stack.toList.reverse.flatMap(b =>
      b.scores.map(s => s -> BigDecimal(b.sum / b.n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got.toSeq === exp)
    // monotone by construction
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    OperatorCaches.releaseAll()
  }

  test("ksTest: identical distributions give d = 0; disjoint supports give d = 1") {
    import spark.implicits._
    val same = Seq((1L, 0), (2L, 0), (1L, 1), (2L, 1)).toDF("b", "g")
    val r0 = ModelEval.ksTest(same, col("b"), col("g")).head()
    assert(r0.getDouble(2) === 0.0 && !r0.getBoolean(4))
    val disjoint = (1L to 30L).map(i => (i, 0)) ++ (31L to 60L).map(i => (i, 1))
    val r1 = ModelEval.ksTest(disjoint.toDF("b", "g"), col("b"), col("g")).head()
    assert(r1.getDouble(2) === 1.0 && r1.getBoolean(4))
  }

  test("ksTest: matches a brute-force CDF sweep on seeded skewed samples") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(400)((rnd.nextInt(20).toLong, 0))
    val b = Seq.fill(300)(((rnd.nextInt(20) + rnd.nextInt(6)).toLong, 1))
    val rows = a ++ b
    val got = ModelEval.ksTest(rows.toDF("b", "g"), col("b"), col("g")).head()
    val support = rows.map(_._1).distinct.sorted
    var (cumA, cumB, d) = (0.0, 0.0, 0.0)
    for (v <- support) {
      cumA += a.count(_._1 == v).toDouble / a.size
      cumB += b.count(_._1 == v).toDouble / b.size
      d = math.max(d, math.abs(cumA - cumB))
    }
    val exp = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) === a.size.toLong && got.getLong(1) === b.size.toLong)
    assert(math.abs(got.getDouble(2) - exp) <= 1e-6 + 1e-12)
    val crit = BigDecimal(ModelEval.KsCrit05 *
      math.sqrt((a.size + b.size).toDouble / (a.size.toLong * b.size)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(3) === crit)
    assert(got.getBoolean(4) === (got.getDouble(2) > crit))
  }

  test("conformalSplit: k-th order statistic and coverage on a planted grid") {
    import spark.implicits._
    // cal residuals are exactly 1..9 (pred 0, labels ±1..9): n=9,
    // k = ceil(10 * 9/10) = 9 -> qhat = 9th smallest = 9
    val cal = (1L to 9L).map(r => (0L, r)).toDF("p", "y")
    val test9 = Seq((0L, 5L), (0L, 9L), (0L, 10L), (0L, 20L)).toDF("p", "y")
    val row = ModelEval.conformalSplit(cal, test9, col("p"), col("y"), 1, 10)
      .head()
    assert(row.getLong(0) === 9L)      // n_cal
    assert(row.getLong(1) === 9L)      // k
    assert(row.getLong(2) === 9L)      // qhat
    assert(row.getLong(3) === 4L)      // n_test
    assert(row.getLong(4) === 2L)      // covered (5 and 9; 10, 20 out)
    assert(row.getDouble(5) === 0.5)
    assert(row.getLong(6) === 18L)     // width = 2 qhat
  }

  test("conformalSplit: matches a driver-side replay on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val calR = Seq.fill(400)((0L, rnd.nextInt(50).toLong))
    val tstR = Seq.fill(600)((0L, rnd.nextInt(50).toLong))
    val got = ModelEval.conformalSplit(calR.toDF("p", "y"), tstR.toDF("p", "y"),
      col("p"), col("y"), 1, 10).head()
    val sorted = calR.map(_._2).sorted
    val k = ((calR.size + 1) * 9 + 9) / 10
    val qhat = sorted(k - 1)
    val covered = tstR.count(_._2 <= qhat)
    assert(got.getLong(1) === k.toLong && got.getLong(2) === qhat)
    assert(got.getLong(4) === covered.toLong)
    // the split-conformal guarantee is >= 1 - alpha in expectation; on
    // this same-distribution fixture the empirical coverage should land
    // near 0.9 (sanity, not the exact property)
    assert(got.getDouble(5) > 0.85)
  }

  test("conformalSplit: alpha too small for the calibration size -> NULLs") {
    import spark.implicits._
    val cal = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("p", "y")
    val tst = Seq((0L, 1L)).toDF("p", "y")
    // n=3, alpha=1/100: k = ceil(4 * 99/100) = 4 > 3
    val row = ModelEval.conformalSplit(cal, tst, col("p"), col("y"), 1, 100)
      .head()
    assert(row.getLong(1) === 4L)
    assert(row.isNullAt(2) && row.isNullAt(4) && row.isNullAt(5) &&
      row.isNullAt(6))
  }

  test("offPolicyIpsSnips: uniform logging gives IPS = SNIPS = mean reward") {
    import spark.implicits._
    val df = Seq((100L, 5L, 5L), (200L, 5L, 5L), (300L, 5L, 5L))
      .toDF("r", "l", "t")
    val row = ModelEval.offPolicyIpsSnips(df, col("r"), col("l"), col("t"),
      rewardScale = 100L, cap = 5L).head()
    assert(row.getLong(0) === 3L && row.getLong(1) === 0L)
    assert(row.getDouble(2) === 2.0 && row.getDouble(3) === 2.0)
  }

  test("offPolicyIpsSnips: clipping caps the weight and counts it") {
    import spark.implicits._
    // t/l = 9 -> raw 90000 > cap 5*10000, clipped to 50000
    val df = Seq((100L, 1L, 9L), (100L, 2L, 2L)).toDF("r", "l", "t")
    val row = ModelEval.offPolicyIpsSnips(df, col("r"), col("l"), col("t"),
      rewardScale = 100L, cap = 5L).head()
    assert(row.getLong(1) === 1L)
    // weights 50000 and 10000; swr = 100*(50000+10000) = 6e6
    // ips = 6e6 / (2 * 1e4 * 100) = 3.0 ; snips = 6e6 / (60000*100) = 1.0
    assert(row.getDouble(2) === 3.0 && row.getDouble(3) === 1.0)
  }

  test("offPolicyIpsSnips: zero/NULL logged propensity drops the row, " +
      "never awards the cap") {
    import spark.implicits._
    // valid rows: both uniform w = 1 -> ips = snips = mean reward = 2.0;
    // the l = 0 row must NOT sneak in as a max-cap weight (Spark least()
    // skips NULL) nor inflate n
    val df = Seq((100L, 5L, 5L), (300L, 5L, 5L), (999L, 0L, 9L))
      .toDF("r", "l", "t")
    val row = ModelEval.offPolicyIpsSnips(df, col("r"), col("l"), col("t"),
      rewardScale = 100L, cap = 5L).head()
    assert(row.getLong(0) === 2L, "n counts only valid-propensity rows")
    assert(row.getLong(1) === 0L, "dropped row is not counted as clipped")
    assert(row.getDouble(2) === 2.0 && row.getDouble(3) === 2.0)
    // all-invalid input: NULL estimates, no crash
    val bad = Seq((100L, 0L, 1L)).toDF("r", "l", "t")
    val r2 = ModelEval.offPolicyIpsSnips(bad, col("r"), col("l"), col("t"),
      rewardScale = 100L, cap = 5L).head()
    assert(r2.getLong(0) === 0L && r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("abPowerMde: matches the closed form on planted arms") {
    import spark.implicits._
    val df = (Seq(10.0, 20.0, 30.0).map((_, 0)) ++
      Seq(40.0, 60.0).map((_, 1))).toDF("v", "g")
    val row = ModelEval.abPowerMde(df, col("v"), col("g")).head()
    val zSum = ModelEval.ZAlpha05 + ModelEval.ZBeta80
    val mde = zSum * math.sqrt(100.0 / 3 + 200.0 / 2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) === 3L && row.getLong(1) === 2L)
    assert(row.getDouble(2) === 20.0)
    assert(row.getDouble(3) === r6(mde))
    assert(row.getDouble(4) === r6(mde / 20.0))
    val nReq = math.ceil(zSum * zSum * 300.0 / (1.0 * 1.0)).toLong
    assert(row.getLong(5) === nReq)
  }

  test("abPowerMde: zero control mean yields NULL relative fields") {
    import spark.implicits._
    val df = (Seq(-1.0, 0.0, 1.0).map((_, 0)) ++
      Seq(1.0, 2.0).map((_, 1))).toDF("v", "g")
    val row = ModelEval.abPowerMde(df, col("v"), col("g")).head()
    assert(row.getDouble(2) === 0.0)
    assert(row.isNullAt(4) && row.isNullAt(5))
  }
}
