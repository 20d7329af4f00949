package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, length, substring}

class LinkageSpec extends SparkSpec {

  private def master = {
    import spark.implicits._
    Seq((1L, "acme corp"), (2L, "acme care"), (3L, "zenith ltd"),
      (4L, "apex corp")).toDF("id", "name")
  }

  test("blockedFuzzyPairs: blocking prunes, distance bound filters inside the block") {
    import spark.implicits._
    val dirty = Seq((10L, "acme c0rp")).toDF("id", "name")
    val got = Linkage.blockedFuzzyPairs(dirty, master,
      Seq(n => length(n), n => substring(n, 1, 2)), maxDistance = 2)
      .collect().map(r => (r.getLong(2), r.getLong(4))).sorted
    // same length + 'ac' prefix: acme corp (d=1), acme care (d=2);
    // apex corp shares length but not prefix -> pruned by blocking
    assert(got === Seq((1L, 1L), (2L, 2L)))
  }

  test("blocking recall limit: an edit inside a blocking key makes the record unmatchable") {
    import spark.implicits._
    val dirty = Seq((10L, "Xcme corp")).toDF("id", "name") // first char edited
    val got = Linkage.blockedFuzzyPairs(dirty, master,
      Seq(n => substring(n, 1, 2)), maxDistance = 2).count()
    assert(got === 0L)
  }

  test("bestMatch ranks by (distance, id) and counts candidates") {
    import spark.implicits._
    val dirty = Seq((10L, "acme c0rp")).toDF("id", "name")
    val got = Linkage.bestMatch(dirty, master,
      Seq(n => length(n), n => substring(n, 1, 2)), maxDistance = 2)
      .head()
    assert(got.getLong(2) === 1L) // acme corp at distance 1 beats acme care at 2
    assert(got.getLong(4) === 1L)
    assert(got.getLong(5) === 2L) // both survived the block+bound
  }

  test("equal-distance rivals break ties to the smaller master id") {
    import spark.implicits._
    val m = Seq((5L, "aaab"), (3L, "aaac")).toDF("id", "name")
    val dirty = Seq((9L, "aaad")).toDF("id", "name")
    val got = Linkage.bestMatch(dirty, m,
      Seq(n => length(n)), maxDistance = 2).head()
    assert(got.getLong(2) === 3L)
  }

  test("pre-flight gate estimates block candidate volume and fails fast") {
    import spark.implicits._
    // one shared block of 10x20 + one left-only block (contributes 0)
    val l = ((0L until 10L).map(i => (i, s"aaa$i")) ++
      Seq((99L, "zz"))).toDF("id", "name")
    val r = (0L until 20L).map(i => (100L + i, f"bb$i%02d")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Linkage.blockedFuzzyPairs(l, r, Seq(n => length(n)),
        maxDistance = 2, maxExpectedCandidates = Some(100L))
    }
    assert(e.getMessage.contains("~200 candidate pairs") &&
      e.getMessage.contains("ceiling 100"))
    // under the ceiling the join runs and matches the ungated result
    val gated = Linkage.blockedFuzzyPairs(l, r, Seq(n => length(n)),
      maxDistance = 2, maxExpectedCandidates = Some(1000L)).count()
    val ungated = Linkage.blockedFuzzyPairs(l, r, Seq(n => length(n)),
      maxDistance = 2).count()
    assert(gated === ungated)
  }
}
