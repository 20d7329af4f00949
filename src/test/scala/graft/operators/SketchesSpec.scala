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
}
