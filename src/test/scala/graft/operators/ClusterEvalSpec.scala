package graft.operators

import graft.SparkSpec

class ClusterEvalSpec extends SparkSpec {

  // two tight, well-separated direction clusters plus one point planted
  // on the wrong side
  private def fixture = {
    import spark.implicits._
    val c0 = Seq(
      (0L, Seq(1.0f, 0.02f, 0.0f), 0L),
      (1L, Seq(1.0f, -0.02f, 0.01f), 0L),
      (2L, Seq(0.99f, 0.01f, -0.01f), 0L))
    val c1 = Seq(
      (3L, Seq(0.01f, 1.0f, 0.02f), 1L),
      (4L, Seq(-0.02f, 1.0f, 0.0f), 1L),
      (5L, Seq(0.0f, 0.98f, 0.01f), 1L))
    val stray = Seq((6L, Seq(0.9f, 0.1f, 0.0f), 1L)) // labeled 1, points at cluster 0
    (c0 ++ c1 ++ stray).toDF("vec_id", "embedding", "label")
  }

  test("simplifiedSilhouette: clean clusters score high, the stray point drags its cluster down") {
    val got = ClusterEval.simplifiedSilhouette(fixture)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n0, a0, b0, s0) = got(0L)
    assert(n0 === 3L)
    assert(a0 < 0.01, s"cluster 0 must be tight, a=$a0")
    assert(b0 > 0.5, s"cluster 0 must be far from rival, b=$b0")
    assert(s0 > 0.9)
    // cluster 1 holds the stray: its mean silhouette must drop below
    // cluster 0's but stay positive (3 of 4 members are genuine)
    val s1 = got(1L)._4
    assert(s1 < s0 && s1 > 0.0, s"s1=$s1 s0=$s0")
  }

  test("simplifiedSilhouette: a point on the wrong side scores negative individually") {
    // verified through the aggregate: moving the stray to its true
    // cluster raises cluster-1 silhouette
    import spark.implicits._
    val fixed = fixture.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1), if (r.getLong(0) == 6L) 0L else r.getLong(2))
    }.toSeq.toDF("vec_id", "embedding", "label")
    val before = ClusterEval.simplifiedSilhouette(fixture)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val after = ClusterEval.simplifiedSilhouette(fixed)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(after(1L) > before(1L))
  }

  test("daviesBouldin: separated clusters index well under 1; merging-quality degrades it") {
    val got = ClusterEval.daviesBouldin(fixture).collect()
    assert(got.length === 2)
    val db = got.head.getDouble(3)
    assert(got.forall(_.getDouble(3) === db), "db_index repeats audit-style")
    assert(db < 1.0, s"well-separated fixture must score < 1, got $db")
    // scatter of the stray-holding cluster exceeds the clean one's
    val scat = got.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scat(1L) > scat(0L))
  }

  test("both reject a single-cluster corpus") {
    import spark.implicits._
    val one = Seq((0L, Seq(1.0f, 0.0f), 0L), (1L, Seq(0.9f, 0.1f), 0L))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      ClusterEval.simplifiedSilhouette(one)
    }
    intercept[IllegalArgumentException] {
      ClusterEval.daviesBouldin(one)
    }
  }
}
