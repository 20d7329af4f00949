package graft

/** The run-health canary exists because BENCH_r06 shipped a 2.4×
  * uniformly-inflated total that only an out-of-band judge re-run could
  * falsify — the family-median outlier pass compares against an equally
  * degraded median and stays silent. These tests force both regimes in
  * process: a clean host must NOT flag, a deliberately oversubscribed one
  * must.
  */
class BenchCanarySpec extends SparkSpec {

  test("clean run stays inside the pinned envelope (no degraded flag)") {
    Bench.canarySampleMs(spark) // untimed JIT warmup, as in the bench main
    val canaries = (1 to 3).map(_ => Bench.canarySampleMs(spark))
    assert(!Bench.canaryDegraded(canaries),
      s"clean host flagged degraded: $canaries vs ceiling ${Bench.CanaryCeilingMs}")
  }

  test("forced in-process contention produces the degraded flag") {
    Bench.canarySampleMs(spark) // warm first, so only contention inflates
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val spinners = (1 to Runtime.getRuntime.availableProcessors * 8).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.setPriority(Thread.MAX_PRIORITY); t.start(); t
    }
    try {
      val contended = (1 to 3).map(_ => Bench.canarySampleMs(spark))
      assert(Bench.canaryDegraded(contended),
        s"8× CPU oversubscription not flagged: $contended vs ceiling ${Bench.CanaryCeilingMs}")
    } finally {
      stop.set(true)
      spinners.foreach(_.join(1000))
    }
  }

  test("degradation predicate arms: absolute ceiling and within-run spread") {
    val nominal = Bench.CanaryNominalMs
    assert(!Bench.canaryDegraded(Seq(nominal, nominal, nominal)))
    assert(!Bench.canaryDegraded(Seq.empty), "no observations is not evidence")
    // absolute arm: uniform inflation (the r6 shape) with zero spread
    assert(Bench.canaryDegraded(Seq(nominal * 3, nominal * 3, nominal * 3)))
    // spread arm: came-and-went contention — here a LOW outlier (a
    // mid-run observation 3.5× faster than the start one exceeds even the
    // measured warm-up drift band), with every value under the ceiling
    assert(Bench.canaryDegraded(Seq(nominal * 2.2, nominal * 0.6, nominal * 0.62)))
    // the measured clean-run shape (219/110/80 at nominal 120) must pass
    assert(!Bench.canaryDegraded(Seq(nominal * 1.83, nominal * 0.92, nominal * 0.67)))
  }
}
