package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecsysSpec extends SparkSpec {

  test("alsRank1 fits exactly rank-1 data to zero RMSE") {
    import spark.implicits._
    // r_ij = a_i * b_j: a perfect rank-1 matrix must be recovered exactly
    val a = Map(1L -> 2.0, 2L -> 0.5, 3L -> 1.5)
    val b = Map("x" -> 4.0, "y" -> 1.0, "z" -> 2.0)
    val rows = for (u <- a.keys.toSeq; i <- b.keys.toSeq)
      yield (u, i, a(u) * b(i))
    val got = Recsys.alsRank1(rows.toDF("u", "i", "r"),
        col("u"), col("i"), col("r"), rounds = 3)
      .collect()
    // factors land on the 6-dp grid each update, so the reconstruction
    // carries ~1e-6 anchoring residue — near-zero, not bit-zero
    assert(got.forall(_.getDouble(3) < 1e-4),
      s"rmse must be ~0 on rank-1 data, got ${got.head.getDouble(3)}")
    // item factors proportional to b (the u·v split is scale-ambiguous,
    // so assert ratios, not absolute values)
    val v = got.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(v("x") / v("y") - 4.0) < 1e-4)
    assert(math.abs(v("z") / v("y") - 2.0) < 1e-4)
    assert(got.forall(_.getLong(2) === 3L))
  }

  test("alsRank1 matches a driver-side replay of the anchored rounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val users = (1L to 40L).toSeq
    val items = Seq("a", "b", "c", "d")
    val rows = for {
      u <- users; i <- items if rnd.nextInt(10) < 7 // ~70% observed
    } yield (u, i, (rnd.nextInt(500) + 1) / 10.0)
    val got = Recsys.alsRank1(rows.toDF("u", "i", "r"),
        col("u"), col("i"), col("r"), rounds = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var v = items.map(_ -> 1.0).toMap
    var u = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      u = rows.groupBy(_._1).map { case (uid, rs) =>
        uid -> r6(rs.map(x => x._3 * v(x._2)).sum /
          rs.map(x => v(x._2) * v(x._2)).sum)
      }
      v = rows.groupBy(_._2).map { case (iid, rs) =>
        iid -> r6(rs.map(x => x._3 * u(x._1)).sum /
          rs.map(x => u(x._1) * u(x._1)).sum)
      }
    }
    items.foreach { i =>
      assert(math.abs(got(i) - v(i)) <= 1e-6, s"item $i: ${got(i)} vs ${v(i)}")
    }
  }

  test("alsRank1 round-1 user factor is the user's mean rating") {
    import spark.implicits._
    val rows = Seq((1L, "a", 2.0), (1L, "b", 4.0), (2L, "a", 10.0))
    // with rounds = 1: u_i = mean rating (v ≡ 1), then v refit once
    val got = Recsys.alsRank1(rows.toDF("u", "i", "r"),
        col("u"), col("i"), col("r"), rounds = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // u1 = {1 -> 3, 2 -> 10}; v(a) = (2*3 + 10*10)/(9 + 100) = 106/109
    assert(math.abs(got("a") - 106.0 / 109.0) < 1e-6)
    // v(b) = 4*3/9 = 4/3
    assert(math.abs(got("b") - 4.0 / 3.0) < 1e-6)
  }
}
