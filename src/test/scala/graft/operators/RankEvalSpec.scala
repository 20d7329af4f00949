package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Session-10 rank/calibration operators plus the two adjunct additions
  * (Profiling.acf, Privacy.randomizedResponse): exact driver-side replays
  * on known fixtures plus seeded-random checks against brute-force scalar
  * implementations.
  */
class RankEvalSpec extends SparkSpec {

  import RankEval._

  private def mw(rows: Seq[(Long, Int)]) = {
    import spark.implicits._
    mannWhitney(rows.toDF("v", "g"), col("v"), col("g")).collect().head
  }

  test("mannWhitney: textbook no-tie case, z on the 6-dp grid") {
    // A = {1,2,3}, B = {4,5,6}: U_a = 0, mu = 4.5, sigma^2 = 9*7/12
    val r = mw(Seq(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    assert(r.getAs[Long]("n_a") === 3 && r.getAs[Long]("n_b") === 3)
    assert(r.getAs[Double]("u") === 0.0)
    val z = BigDecimal(-4.5 / math.sqrt(5.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") === z)
    assert(r.getAs[Boolean]("significant"))
  }

  test("mannWhitney: all-tied input yields NULL z, not NaN") {
    val r = mw(Seq(5L -> 0, 5L -> 0, 5L -> 1, 5L -> 1))
    // midranks: every subject gets (n+1)/2, U_a = n_a*n_b/2, sigma^2 = 0
    assert(r.getAs[Double]("u") === 2.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("mannWhitney: U matches a brute-force midrank computation with ties") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = Seq.fill(60)((rnd.nextInt(9).toLong, rnd.nextInt(2)))
      val na = rows.count(_._2 == 0).toLong
      // scalar midranks over the sorted values
      val sorted = rows.map(_._1).sorted
      val rank = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
      val ra = rows.filter(_._2 == 0).map(r => rank(r._1)).sum
      val expU = ra - na * (na + 1) / 2.0
      assert(mw(rows).getAs[Double]("u") === expU)
    }
  }

  test("spearman: perfect monotone is 1, reversed is -1") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, (i * 3 + 7).toLong))
      .toDF("x", "y")
    assert(spearman(df, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") === 1.0)
    val rev = (1 to 20).map(i => (i.toLong, (100 - i).toLong))
      .toDF("x", "y")
    assert(spearman(rev, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") === -1.0)
  }

  test("spearman: constant margin yields NULL rho") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, 4L)).toDF("x", "y")
    val r = spearman(df, col("x"), col("y")).collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  test("spearman: matches scalar Pearson-of-midranks under ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val rows = Seq.fill(50)((rnd.nextInt(7).toLong, rnd.nextInt(7).toLong))
      def ranks(vs: Seq[Long]): Map[Long, Double] = {
        val sorted = vs.sorted
        sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
      }
      val xs = rows.map(r => ranks(rows.map(_._1))(r._1))
      val ys = rows.map(r => ranks(rows.map(_._2))(r._2))
      val n = rows.size.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xs.map(a => (a - mx) * (a - mx)).sum
      val vy = ys.map(b => (b - my) * (b - my)).sum
      assert(vx > 0 && vy > 0, "degenerate draw")
      val got = spearman(rows.toDF("x", "y"), col("x"), col("y"))
        .collect().head.getAs[Double]("rho")
      assert(math.abs(got - num / (math.sqrt(vx) * math.sqrt(vy))) <= 1e-5)
    }
  }

  test("prAuc: perfect separation is 1; known tied-block case") {
    import spark.implicits._
    val perfect = Seq((3L, 1L), (3L, 1L), (1L, 0L), (1L, 0L))
      .toDF("s", "y")
    assert(prAuc(perfect, col("s"), col("y"))
      .collect().head.getAs[Double]("pr_auc") === 1.0)
    // blocks desc: (rec .5, prec .5) then (rec 1, prec .5) from (0, 1):
    // .5*(1+.5)/2 + .5*(.5+.5)/2 = .375 + .25
    val tied = Seq((2L, 1L), (2L, 0L), (1L, 0L), (1L, 1L)).toDF("s", "y")
    assert(prAuc(tied, col("s"), col("y"))
      .collect().head.getAs[Double]("pr_auc") === 0.625)
  }

  test("ece: exact on a two-bin fixture; mce is the worst bin") {
    import spark.implicits._
    // bin 10 (conf 1.0): acc 1/2 -> ce .5 over 2 rows; bin 5 (conf .5):
    // acc .5 -> ce 0 over 2 rows; ece = (2*.5 + 2*0)/4
    val df = Seq((10L, 1L), (10L, 0L), (5L, 1L), (5L, 0L)).toDF("c", "y")
    val r = ece(df, col("c"), 10, col("y")).collect().head
    assert(r.getAs[Double]("ece") === 0.25)
    assert(r.getAs[Double]("mce") === 0.5)
  }

  test("bhAdjust: reverse running min enforces monotone adjusted p") {
    import spark.implicits._
    val df = Seq(("a", 0.005), ("b", 0.011), ("c", 0.02), ("d", 0.04),
      ("e", 0.05)).toDF("m", "p")
    val got = bhAdjust(df, col("m"), col("p")).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Double]("p_adj"),
        r.getAs[Boolean]("significant")))
    assert(got === Array(("a", 0.025, true), ("b", 0.0275, true),
      ("c", 0.033333, true), ("d", 0.05, true), ("e", 0.05, true)))
  }

  test("bhAdjust: a late small p pulls earlier adjusted values down") {
    import spark.implicits._
    // raw: a .3, b .2 (rank2: 2*.2/2) ... classic non-monotone raw fixed
    // by the tail min
    val df = Seq(("a", 0.1), ("b", 0.2), ("c", 0.2)).toDF("m", "p")
    val got = bhAdjust(df, col("m"), col("p")).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Double]("p_adj")))
    // raws: a: 3*.1/1 = .3; b: 3*.2/2 = .3; c: 3*.2/3 = .2
    // tail mins: c .2, b .2, a .2
    assert(got === Array(("a", 0.2), ("b", 0.2), ("c", 0.2)))
  }

  test("rankingEval: single query with one relevant item at rank 2") {
    import spark.implicits._
    val ranked = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("qid", "item", "rank")
    val rel = Seq((1L, 20L)).toDF("qid", "item")
    val r = rankingEval(ranked, rel, 10).collect().head
    val d2 = BigDecimal(discounts(10)(1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_queries") === 1)
    assert(r.getAs[Double]("ndcg") === d2) // idcg = d1 = 1.0
    assert(r.getAs[Double]("mrr") === 0.5)
    assert(r.getAs[Double]("recall") === 1.0)
  }

  test("rankingEval: zero-hit query scores 0 and still counts") {
    import spark.implicits._
    val ranked = Seq((1L, 10L, 1), (2L, 10L, 1)).toDF("qid", "item", "rank")
    val rel = Seq((1L, 10L), (2L, 99L)).toDF("qid", "item")
    val r = rankingEval(ranked, rel, 10).collect().head
    assert(r.getAs[Long]("n_queries") === 2)
    assert(r.getAs[Double]("ndcg") === 0.5)
    assert(r.getAs[Double]("mrr") === 0.5)
    assert(r.getAs[Double]("recall") === 0.5)
  }

  test("acf: alternating series has acf(1) = -7/8, acf(2) = 6/8") {
    import spark.implicits._
    val series = (1 to 8).map(i => (i.toLong, if (i % 2 == 0) 1L else -1L))
      .toDF("t", "x")
    val got = Profiling.acf(series, col("t"), col("x"), 2).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("acf")))
    assert(got === Array((1L, 7L, -0.875), (2L, 6L, 0.75)))
  }

  test("acf: constant series yields NULL acf by the shared guard") {
    import spark.implicits._
    val series = (1 to 8).map(i => (i.toLong, 3L)).toDF("t", "x")
    val r = Profiling.acf(series, col("t"), col("x"), 1).collect().head
    assert(r.isNullAt(r.fieldIndex("acf")))
  }

  test("randomizedResponse: scalar hash replay reproduces every coin") {
    import spark.implicits._
    val rows = (1L to 200L).map(id => (id, (id % 3 == 0)))
      .map { case (id, b) => (id, if (b) 1L else 0L) }
    val df = rows.toDF("id", "truth")
    val r = Privacy.randomizedResponse(df, col("id"), col("truth"))
      .collect().head
    // driver-side twin of the portable draw
    val repSum = rows.map { case (id, tr) =>
      val keep = PortableHash.portable60(s"rr:$id") % 4 < 3
      if (keep) tr else 1L - tr
    }.sum
    val n = rows.size.toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("reported_rate") === r6(repSum / n))
    assert(r.getAs[Double]("estimate") === r6((repSum / n - 0.25) / 0.5))
    assert(r.getAs[Double]("p_truth") === 0.75)
  }

  test("passAtK: exact combinatorial values and the clamp cases") {
    import spark.implicits._
    // (n=10, c=2, k=5): 1 - C(8,5)/C(10,5) = 1 - 56/252 = 0.777778
    // (n=3, c=0, k=5): k clamps to 3, c=0 -> 0
    // (n=10, c=7, k=5): n-c=3 < 5 -> pinned 1
    val df = Seq((1L, 10L, 2L), (2L, 3L, 0L), (3L, 10L, 7L))
      .toDF("task", "n", "c")
    val r = ModelEval.passAtK(df, col("n"), col("c"), 5).collect().head
    assert(r.getAs[Long]("n_tasks") === 3)
    assert(r.getAs[Int]("k") === 5)
    val exp = BigDecimal((1.0 - 56.0 / 252 + 0.0 + 1.0) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("pass_at_k") === exp)
  }

  test("bradleyTerry: a dominant model gets the top rating; sum is ~1") {
    import spark.implicits._
    // a beats b 9/10, b beats c 8/10, a beats c 9/10
    val wins = Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 8L),
      ("c", "b", 2L), ("a", "c", 9L), ("c", "a", 1L)).toDF("a", "b", "w")
    val got = bradleyTerry(wins, rounds = 8).collect()
      .map(r => (r.getAs[String]("model"), r.getAs[Double]("rating")))
    assert(got.map(_._1).toSeq === Seq("a", "b", "c"))
    val byM = got.toMap
    assert(byM("a") > byM("b") && byM("b") > byM("c"))
    assert(math.abs(got.map(_._2).sum - 1.0) <= 1e-6)
  }

  test("bradleyTerry: symmetric wins converge to equal ratings") {
    import spark.implicits._
    val wins = Seq(("a", "b", 5L), ("b", "a", 5L)).toDF("a", "b", "w")
    val got = bradleyTerry(wins, rounds = 4).collect()
      .map(_.getAs[Double]("rating"))
    assert(got.toSeq === Seq(0.5, 0.5))
  }

  test("winRateWilson: interval brackets the rate and matches scalar replay") {
    import spark.implicits._
    val wins = Seq(("a", "b", 7L), ("b", "a", 3L)).toDF("a", "b", "w")
    val r = winRateWilson(wins).collect().head
    assert(r.getAs[String]("a") === "a" && r.getAs[String]("b") === "b")
    assert(r.getAs[Long]("n") === 10)
    assert(r.getAs[Double]("rate") === 0.7)
    val z = ZCrit05
    val rate = 0.7
    val center = rate + z * z / (2.0 * 10)
    val margin = z * math.sqrt(rate * (1.0 - rate) / 10 +
      z * z / (4.0 * 10 * 10))
    val denom = 1.0 + z * z / 10
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("lo") === r6((center - margin) / denom))
    assert(r.getAs[Double]("hi") === r6((center + margin) / denom))
    assert(r.getAs[Double]("lo") < 0.7 && 0.7 < r.getAs[Double]("hi"))
  }

  test("randomizedResponse: rejects the signal-free p = 1/2") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "truth")
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(df, col("id"), col("truth"),
        pNum = 1, pDen = 2)
    }
  }

  test("rrfFuse: closed-form reciprocal ranks, NULL scores rank last") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(100L), Some(1L)), // r1=1, r2=3
      (2L, Some(50L), Some(10L)), // r1=2, r2=1
      (3L, None, Some(5L)))       // r1=3 (null last), r2=2
      .toDF("id", "s1", "s2")
    val got = RankEval.rrfFuse(df, col("id"), col("s1"), col("s2"),
        k = 60, topK = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def rrf(a: Long, b: Long) = BigDecimal(1.0 / (60 + a) + 1.0 / (60 + b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((1L, 3L, rrf(1, 3))))
    assert(got(2L) === ((2L, 1L, rrf(2, 1))))
    assert(got(3L) === ((3L, 2L, rrf(3, 2))))
  }

  test("fingerprintDiff: identical snapshots certify empty; a mutation " +
      "surfaces only its bucket") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => s"row-$i")
    val a = rows.toDF("c")
    // identical snapshots (even shuffled/repartitioned): no diff rows
    val same = RankEval.fingerprintDiff(a,
      scala.util.Random.shuffle(rows).toDF("c").repartition(7),
      col("c"), col("c"), buckets = 16L)
    assert(same.count() === 0L)
    // drop one row: exactly the buckets containing it disagree (one)
    val b = rows.filterNot(_ == "row-123").toDF("c")
    val diff = RankEval.fingerprintDiff(a, b, col("c"), col("c"),
      buckets = 16L).collect()
    assert(diff.length === 1)
    assert(diff.head.getLong(1) === diff.head.getLong(2) + 1) // n_a = n_b+1
  }

  test("tableFingerprint is order- and partition-invariant, diff-sensitive") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i % 3, s"row-$i"))
    val a = rows.toDF("g", "c")
    val b = scala.util.Random.shuffle(rows).toDF("g", "c").repartition(13)
    def fp(df: org.apache.spark.sql.DataFrame) =
      RankEval.tableFingerprint(df, col("g"), col("c"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fp(a) === fp(b))
    // one changed row moves the fingerprint of exactly its group
    val c = rows.updated(7, (rows(7)._1, "row-MUTATED")).toDF("g", "c")
    val (fa, fc) = (fp(a), fp(c))
    val changedGroup = rows(7)._1
    assert(fa(changedGroup) !== fc(changedGroup))
    assert(fa.filter(_._1 != changedGroup) ===
      fc.filter(_._1 != changedGroup))
  }
}
