package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck sweep over autoCosineBanding's input space: the derivation
  * has hand-derived edge guards (the pw >= 1 clamp at threshold 1, the
  * recall-infeasible fallback to w = 2, the band cap) that only a sweep
  * pins — and the q_embed_neardup_auto oracle splices the derived params,
  * so any drift here is a silent cross-engine mismatch waiting to happen.
  */
class AutoBandingPropertySpec extends AnyFunSuite {

  private def recall(t: Double, w: Int, b: Int): Double = {
    val p = 1.0 - math.acos(t) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, w), b)
  }

  test("banding invariants hold across (threshold, n, dim)") {
    val genT = Gen.choose(0.1, 0.999)
    val genN = Gen.choose(1L, 1000000000L)
    val genDim = Gen.oneOf(8, 64, 256, 1024)
    val prop = Prop.forAll(genT, genN, genDim) { (t, n, dim) =>
      val (np, b) = Similarity.autoCosineBanding(t, n, dim)
      val w = np / b
      val shape = b >= 1 && b <= 64 && np % b == 0 && w >= 2 && w <= 62
      // the 95% GW recall target holds whenever the band count is not
      // capped; at the cap (low threshold far from LSH's design point)
      // recall is best-effort by design
      val recallOk = recall(t, w, b) >= 0.95 || b == 64
      // pure function: the oracle replays this at catalog-build time
      val deterministic = Similarity.autoCosineBanding(t, n, dim) == ((np, b))
      shape && recallOk && deterministic
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(800), prop)
    assert(res.passed, res.status.toString)
  }

  test("width is monotone in corpus size at a fixed threshold") {
    // the candidate term b·n/2^w pushes the cost-optimal width up with n;
    // a width that SHRANK with corpus growth would re-create the
    // super-linear occupancy blowup BENCH_SF1 measured
    for (t <- Seq(0.5, 0.8, 0.9, 0.95)) {
      val widths = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L).map { n =>
        val (np, b) = Similarity.autoCosineBanding(t, n, dim = 64)
        np / b
      }
      assert(widths == widths.sorted, s"t=$t widths=$widths")
    }
  }

  test("threshold-1 and tiny-n degenerate corners stay sane") {
    val (np1, b1) = Similarity.autoCosineBanding(1.0, 1000000L, dim = 64)
    assert(b1 >= 1 && np1 % b1 == 0) // pw >= 1 clamp: one band suffices
    val (npTiny, bTiny) = Similarity.autoCosineBanding(0.9, 1L, dim = 8)
    assert(bTiny >= 1 && npTiny % bTiny == 0 && npTiny / bTiny >= 2)
  }

  // ---- autoAnnParams: the query-side twin (q_ann_lsh_auto splices it) ----

  private def annRecall(t: Double, w: Int, h: Int): Double = {
    val p = 1.0 - math.acos(t) / math.Pi
    def choose(n: Int, k: Int): Double =
      (0 until k).map(j => (n - j).toDouble / (j + 1)).product
    (0 to h).map(i => choose(w, i) * math.pow(1 - p, i) * math.pow(p, w - i)).sum
  }

  test("ann params invariants hold across (simTarget, n, dim)") {
    val genT = Gen.choose(0.1, 0.999)
    val genN = Gen.choose(1L, 1000000000L)
    val genDim = Gen.oneOf(8, 64, 256, 1024)
    val prop = Prop.forAll(genT, genN, genDim) { (t, n, dim) =>
      val (w, h) = Similarity.autoAnnParams(t, n, dim)
      val shape = w >= 2 && w <= 62 && h >= 0 && h <= math.min(w, 8)
      // 95% recall at the target similarity unless no width was feasible
      // within the radius cap (then best-effort by design, like the cap
      // arm of autoCosineBanding)
      val recallOk = annRecall(t, w, h) >= 0.95 ||
        !(2 to 62).exists(wf => (0 to math.min(wf, 8)).exists(annRecall(t, wf, _) >= 0.95))
      val deterministic = Similarity.autoAnnParams(t, n, dim) == ((w, h))
      shape && recallOk && deterministic
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(800), prop)
    assert(res.passed, res.status.toString)
  }

  test("candidate estimator separates the feasible and infeasible regimes") {
    // the BENCH_SF10 §5 boundary, as numbers a caller can check up front:
    // t=0.25 at n=5e5 is the measured SparkException (~1e11 pairs);
    // t=0.9 at the same n is the measured 6.98 s (occupancy ~1)
    val low = Similarity.expectedAutoCandidatePairs(0.25, 500000L, 64)
    val high = Similarity.expectedAutoCandidatePairs(0.9, 500000L, 64)
    assert(low > 1e10, s"low-threshold estimate should be huge, got $low")
    assert(high < 1e8, s"high-threshold estimate should be modest, got $high")
    // and the estimate is monotone DOWN in threshold at fixed n
    val mids = Seq(0.25, 0.5, 0.8, 0.9, 0.95)
      .map(Similarity.expectedAutoCandidatePairs(_, 500000L, 64))
    assert(mids == mids.sortBy(-_), s"estimates not decreasing: $mids")
  }

  test("ann bucket width is monotone in corpus size at a fixed target") {
    // occupancy n/2^w is the candidate driver: a width that shrank with
    // corpus growth would be the fixed-bucket drift this closes
    for (t <- Seq(0.8, 0.9, 0.95)) {
      val widths = Seq(1000L, 10000L, 100000L, 1000000L, 10000000L).map { n =>
        Similarity.autoAnnParams(t, n, dim = 64)._1
      }
      assert(widths == widths.sorted, s"t=$t widths=$widths")
    }
  }
}
