package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecompSpec extends SparkSpec {

  private def rnd7(x: Double): Double =
    BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // seeded 3-dim corpus with a dominant direction along dim 1 and a
  // perfectly-correlated copy in dim 2 (so corr(1,2) = 1 exactly)
  private lazy val vecs: Seq[Array[Float]] = {
    val r = new scala.util.Random(42)
    Seq.fill(200) {
      val a = r.nextGaussian() * 3.0
      val b = r.nextGaussian() * 0.3
      Array(a.toFloat, (2 * a).toFloat, b.toFloat)
    }
  }

  private def corpus = {
    import spark.implicits._
    vecs.map(Tuple1(_)).toDF("vec")
  }

  test("packedMoments matches a driver-side brute force; ragged/null rows drop") {
    import spark.implicits._
    val withJunk = corpus
      .unionByName(Seq(Tuple1(Array(1f, 2f))).toDF("vec"))        // ragged
      .unionByName(Seq(Tuple1(null: Array[Float])).toDF("vec"))   // null
    val m = Decomp.packedMoments(withJunk, "vec", 3)
    assert(m.n === vecs.size.toLong)
    for (i <- 0 until 3) {
      val exp = vecs.map(_(i).toDouble).sum
      assert(math.abs(m.s(i) - exp) < 1e-9 * math.max(1.0, math.abs(exp)), s"s($i)")
    }
    var idx = 0
    for (i <- 0 until 3; j <- i until 3) {
      val exp = vecs.map(v => v(i).toDouble * v(j).toDouble).sum
      assert(math.abs(m.p(idx) - exp) < 1e-9 * math.max(1.0, math.abs(exp)), s"p($i,$j)")
      idx += 1
    }
  }

  test("covariance6 equals the brute-force population covariance on the grid") {
    val cov = Decomp.covariance6(Decomp.packedMoments(corpus, "vec", 3), 3)
    val n = vecs.size.toDouble
    for (i <- 0 until 3; j <- 0 until 3) {
      val mi = vecs.map(_(i).toDouble).sum / n
      val mj = vecs.map(_(j).toDouble).sum / n
      val exp = rnd6(vecs.map(v => (v(i) - mi) * (v(j) - mj)).sum / n)
      assert(math.abs(cov(i)(j) - exp) <= 1e-6 + 1e-12, s"cov($i,$j)")
      assert(cov(i)(j) === cov(j)(i), "symmetry")
    }
  }

  test("pcaTopComponent finds the planted direction and replays on the grid") {
    val out = Decomp.pcaTopComponent(corpus, "vec", 3, rounds = 8)
      .collect().sortBy(_.getLong(0))
    assert(out.length === 3)
    val loadings = out.map(_.getDouble(1))
    val lambda = out.map(_.getDouble(2)).distinct
    assert(lambda.length === 1, "one shared eigenvalue")
    // planted direction is (1, 2, 0)/sqrt(5); fixed all-positive start keeps the sign
    assert(math.abs(loadings(0) - 1.0 / math.sqrt(5)) < 0.02, loadings.toSeq)
    assert(math.abs(loadings(1) - 2.0 / math.sqrt(5)) < 0.02, loadings.toSeq)
    assert(math.abs(loadings(2)) < 0.05, loadings.toSeq)
    // exact driver replay of the unrolled iteration (what the oracle does)
    val cov = Decomp.covariance6(Decomp.packedMoments(corpus, "vec", 3), 3)
    var v = Array.fill(3)(rnd7(1.0 / math.sqrt(3.0)))
    for (_ <- 1 to 8) {
      val w = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => rnd7(x / nrm))
    }
    val cv = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
    val lam = rnd6(v.zip(cv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum)
    assert(loadings.toSeq === v.toSeq, "grid replay exact")
    assert(lambda.head === lam, "Rayleigh quotient replay exact")
  }

  test("pcaTopComponents: deflation finds both planted directions in order") {
    val out = Decomp.pcaTopComponents(corpus, "vec", 3, k = 2, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.length === 6)
    val c1 = out.filter(_._1 == 1L)
    val c2 = out.filter(_._1 == 2L)
    // component 1 == the single-component API (same grid, same rounds)
    val single = Decomp.pcaTopComponent(corpus, "vec", 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(c1.map(t => (t._2, t._3, t._4)).toSeq === single.toSeq)
    // component 2 is the residual direction (dim 3), near-orthogonal to c1
    assert(math.abs(math.abs(c2(2)._3) - 1.0) < 0.02, c2.toSeq)
    val dot = c1.zip(c2).map { case (a, b) => a._3 * b._3 }.sum
    assert(math.abs(dot) < 1e-3, s"near-orthogonal, got $dot")
    // eigenvalues in decreasing order, both positive
    assert(c1.head._4 > c2.head._4 && c2.head._4 > 0.0)
    // exact replay: deflate the 6-dp covariance with component 1 and
    // re-run the driver iteration — must equal component 2 bit-for-bit
    val cov = Decomp.covariance6(Decomp.packedMoments(corpus, "vec", 3), 3)
    var v = Array.fill(3)(rnd7(1.0 / math.sqrt(3.0)))
    for (_ <- 1 to 8) {
      val w = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => rnd7(x / nrm))
    }
    val cv = Array.tabulate(3)(i => (0 until 3).map(j => cov(i)(j) * v(j)).sum)
    val lam1 = rnd6(v.zip(cv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum)
    val cov2 = Array.tabulate(3, 3)((i, j) => rnd6(cov(i)(j) - lam1 * v(i) * v(j)))
    var u = Array.fill(3)(rnd7(1.0 / math.sqrt(3.0)))
    for (_ <- 1 to 8) {
      val w = Array.tabulate(3)(i => (0 until 3).map(j => cov2(i)(j) * u(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      u = w.map(x => rnd7(x / nrm))
    }
    assert(c2.map(_._3).toSeq === u.toSeq, "deflated grid replay exact")
  }

  test("corrTopPairs ranks the perfectly-correlated planted pair first") {
    val top = Decomp.corrTopPairs(corpus, "vec", 3, k = 3).collect()
    assert(top.length === 3)
    assert((top(0).getLong(0), top(0).getLong(1)) === (1L, 2L))
    assert(top(0).getDouble(2) === 1.0) // exact on the 6-dp grid
    top.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }
}
