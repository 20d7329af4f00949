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
}
