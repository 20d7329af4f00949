package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("CMS never undercounts, and is exact when width dwarfs cardinality") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(5000)(s"v${rnd.nextInt(40)}")
    val df = vals.toDF("v")
    val truth = vals.groupBy(identity).view.mapValues(_.size).toMap
    // width 4096 over 40 distinct values: collisions vanish, est == exact
    val wide = Sketches.cmsHeavyHitters(df, col("v"), topN = 10, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    wide.foreach { case (t, ex, est) =>
      assert(ex === truth(t).toLong, s"exact side wrong for $t")
      assert(est === ex, s"wide sketch should be exact for $t")
    }
    // width 16 forces collisions: estimates may overcount, never under
    val tight = Sketches.cmsHeavyHitters(df, col("v"), topN = 10, width = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    tight.foreach { case (t, ex, est) =>
      assert(est >= ex, s"CMS undercounted $t: $est < $ex")
    }
    // deterministic under repartition
    val again = Sketches.cmsHeavyHitters(df.repartition(7), col("v"),
        topN = 10, width = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === tight.toSeq)
    OperatorCaches.releaseAll()
  }

  test("HLL sketch table: merge matches exact within bracket, never rescans, idempotent") {
    import spark.implicits._
    // two "crawls" with a planted overlap: crawl 0 sees values 0..2999,
    // crawl 1 sees 2000..5999 -> exact distinct of the union is 6000
    val rows = (0 until 3000).map(v => (0, "g", s"v$v")) ++
      (2000 until 6000).map(v => (1, "g", s"v$v"))
    val df = rows.toDF("crawl", "grp", "v")
    val sketches = Sketches.hllSketchTable(df, Seq("crawl", "grp"), col("v"))
    assert(sketches.count() === 2L) // one bounded row per (crawl, group)
    val est = Sketches.hllMergeEstimate(sketches, Seq("grp"))
      .head().getLong(1)
    assert(math.abs(est - 6000.0) <= 6000 * 0.05 + 16,
      s"union estimate $est outside bracket around 6000")
    // idempotent: unioning a crawl's sketch with itself changes nothing
    val doubled = Sketches.hllMergeEstimate(
      sketches.unionByName(sketches), Seq("grp")).head().getLong(1)
    assert(doubled === est, s"re-merged estimate drifted: $doubled != $est")
    // incrementality: merging per-crawl sketches equals sketching the
    // concatenated stream (the never-rescan-the-base claim)
    val direct = Sketches.hllMergeEstimate(
      Sketches.hllSketchTable(df, Seq("grp"), col("v")), Seq("grp"))
      .head().getLong(1)
    assert(direct === est, s"merge path $est != direct path $direct")
  }

  test("log-hist quantile sketch: bound holds, merge == direct, small values exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy-tailed positive values across 5 decades, 2 groups
    val rows = (0 until 4000).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val v = math.exp(rnd.nextDouble() * 11.5) / 100.0 // 0.01 .. ~1e3
      (g, i % 7, v)
    }
    val df = rows.toDF("grp", "part", "v")
    val qs = Seq(0.1, 0.5, 0.9, 0.95, 0.99, 1.0)

    val direct = Sketches.logHistSketch(df, col("v"), Seq("grp"))
    val merged = Sketches.logHistMerge(
      Sketches.logHistSketch(df, col("v"), Seq("grp", "part")), Seq("grp"))
    // merge path == direct build, bucket for bucket
    assert(merged.orderBy("grp", "bhi", "blo").collect().toSeq ===
      direct.orderBy("grp", "bhi", "blo").collect().toSeq)

    val est = Sketches.logHistQuantiles(merged, Seq("grp"), qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(est.size === 12) // 2 groups x 6 qs, exactly one bucket wins per (g, q)

    // exact disc quantiles per group on the cents grid the sketch sees
    val byGroup = rows.groupBy(_._1).view
      .mapValues(_.map(t => math.floor(t._3 * 100 + 0.5) / 100.0).sorted.toIndexedSeq)
    for (g <- Seq("a", "b"); q <- qs) {
      val xs = byGroup(g)
      val exact = xs(math.max(math.ceil(q * xs.size).toInt, 1) - 1)
      val e = est((g, q))
      assert(math.abs(e - exact) <= exact * 0.03125 + 1e-9,
        s"($g, $q): est $e vs exact $exact breaks the 2^-5 bound")
    }

    // cents below 2^subBits land in width-1 buckets: estimate == value
    val tiny = Seq(("t", 0.01), ("t", 0.05), ("t", 0.15), ("t", 0.15)).toDF("grp", "v")
    val tinyEst = Sketches.logHistQuantiles(
        Sketches.logHistSketch(tiny, col("v"), Seq("grp")), Seq("grp"), Seq(0.5, 1.0))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    assert(tinyEst(0.5) === 0.05 && tinyEst(1.0) === 0.15)

    // non-positive values take the reserved bucket and estimate 0
    val zeros = Seq(("z", 0.0), ("z", -3.0), ("z", 12.0)).toDF("grp", "v")
    val zEst = Sketches.logHistQuantiles(
        Sketches.logHistSketch(zeros, col("v"), Seq("grp")), Seq("grp"), Seq(0.5))
      .head().getDouble(2)
    assert(zEst === 0.0)

    // deterministic under repartition
    val again = Sketches.logHistQuantiles(
        Sketches.logHistMerge(
          Sketches.logHistSketch(df.repartition(13), col("v"), Seq("grp", "part")),
          Seq("grp")), Seq("grp"), qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(again === est)
  }

  test("exactQuantilesViaSketch equals brute-force disc quantiles on raw values") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      // mix of scales plus planted ties and tiny values
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(20) / 100.0          // sub-2^subBits cents
        case 1 => 7.77                              // heavy tie
        case _ => math.exp(rnd.nextDouble() * 9) / 10.0
      }
      (g, v)
    }
    val df = rows.toDF("grp", "v").repartition(11)
    val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = Sketches.exactQuantilesViaSketch(df, col("v"), Seq("grp"), qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(got.size === 18)
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val xs = byGroup(g)
      val want = xs(math.max(math.ceil(q * xs.size).toInt, 1) - 1)
      assert(got((g, q)) === want, s"($g, $q)")
    }
  }
}
