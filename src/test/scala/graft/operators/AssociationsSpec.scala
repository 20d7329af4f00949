package graft.operators

import graft.SparkSpec

class AssociationsSpec extends SparkSpec {

  test("pairRules: support/confidence/lift hand-checked, caps cut, dedup holds") {
    import spark.implicits._
    // 4 baskets; (1,2) co-occur in two of them, (1,3) in one;
    // item 9 is in every basket (the ubiquitous hub)
    val baskets = Seq(
      (100L, 1L), (100L, 2L), (100L, 9L),
      (200L, 1L), (200L, 2L), (200L, 9L),
      (300L, 1L), (300L, 3L), (300L, 9L),
      (400L, 3L), (400L, 9L),
      (100L, 1L) // duplicate line must not double-count
    ).toDF("order_id", "item_id")

    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Associations.pairRules(baskets, "order_id", "item_id",
        minPairCount = 1)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    // (1,2): n_ab=2, n_1=3, n_2=2, N=4 -> support .5, conf 2/3 & 1, lift 2*4/(3*2)
    assert(got((1L, 2L)) === ((2L, 0.5, r6(2.0 / 3), 1.0, r6(8.0 / 6))))
    // (1,9): lift = 3*4/(3*4) = 1 — the ubiquitous item carries no signal
    assert(got((1L, 9L))._5 === 1.0)

    // minPairCount gates absolute support, and the Apriori downward-
    // closure prune it triggers is LOSSLESS: the gated result equals the
    // ungated result filtered to n_ab >= 2 (identical metrics — N is
    // untouched by the frequency prune)
    val gated = Associations.pairRules(baskets, "order_id", "item_id",
        minPairCount = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(!gated.contains((1L, 3L)) && gated.contains((1L, 2L)))
    assert(gated === got.filter(_._2._1 >= 2L))

    // maxItemDf drops the hub item AND re-bases N on surviving baskets:
    // basket 400 only had items {3, 9}; with 9 capped it still holds 3
    val capped = Associations.pairRules(baskets, "order_id", "item_id",
        minPairCount = 1, maxItemDf = 3)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(!capped.keySet.exists { case (a, b) => a == 9L || b == 9L })
    assert(capped((1L, 2L)) === 0.5) // N still 4: every basket kept an item
    OperatorCaches.releaseAll()
  }

  test("modularity: two cliques joined by one bridge edge, exact arithmetic") {
    import spark.implicits._
    // K3 {1,2,3} + K3 {4,5,6} + bridge 3-4: m=7 edges
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L), (2L, 1L) /* reverse duplicate */).toDF("src", "dst")
    val comms = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("node", "label")
    val row = GraphRank.modularity(edges, comms).head()
    assert(row.getLong(0) === 2L)   // communities
    assert(row.getLong(1) === 7L)   // edges (deduped, undirected)
    assert(row.getLong(2) === 6L)   // intra (the bridge is inter)
    // d_10 = 7 (degrees 2,2,3), d_20 = 7 -> Q = 6/7 - (49+49)/(4*49) = 6/7 - 1/2
    val want = BigDecimal(6.0 / 7 - 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) === want)
    // a one-community partition always scores 0: intra/m = 1, (2m)^2/(4m^2) = 1
    val one = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("node", "label")
    assert(GraphRank.modularity(edges, one).head().getDouble(3) === 0.0)
    OperatorCaches.releaseAll()
  }
}
