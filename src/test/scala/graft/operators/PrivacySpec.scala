package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  // (segment, bucketed sensitive value) rows; one QI column keeps the
  // brute-force replay readable
  private def df(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("seg", "v")
  }

  private def emdOf(rows: Seq[(String, Long)]): Map[String, (Long, Double)] =
    Privacy.tCloseness(df(rows), Seq("seg"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("a class mirroring the global distribution has EMD 0") {
    // both classes are 50/50 over {0, 1} -> global is 50/50 -> EMD 0
    val rows = Seq("a" -> 0L, "a" -> 1L, "b" -> 0L, "b" -> 1L)
    val got = emdOf(rows)
    assert(got("a") === ((2L, 0.0)))
    assert(got("b") === ((2L, 0.0)))
  }

  test("an all-top-bucket class gets the analytic EMD; absent values count as 0") {
    // global support {0,1,2} each 1/3 (9 rows); class "x" sits entirely on 2.
    // cumulative diffs at v=0,1,2: |0-1/3| + |0-2/3| + |1-1| = 1, /(m-1)=2 -> 0.5
    val rows =
      Seq.fill(3)("y" -> 0L) ++ Seq.fill(3)("y" -> 1L) ++
        Seq.fill(2)("y" -> 2L) ++ Seq("x" -> 2L)
    val got = emdOf(rows)
    assert(got("x")._1 === 1L)
    assert(math.abs(got("x")._2 - 0.5) <= 1e-6)
  }

  test("matches a brute-force EMD replay on a seeded multi-class table") {
    val rnd = new scala.util.Random(7)
    val segs = Seq("a", "b", "c", "d")
    val rows = Seq.fill(400)((segs(rnd.nextInt(segs.size)), rnd.nextInt(6).toLong))
    val got = emdOf(rows)
    val support = rows.map(_._2).distinct.sorted
    val m = support.size
    val nTot = rows.size.toDouble
    val gCnt = rows.groupBy(_._2).view.mapValues(_.size).toMap
    for (s <- segs) {
      val cls = rows.filter(_._1 == s)
      val cCnt = cls.groupBy(_._2).view.mapValues(_.size).toMap
      var cum = 0.0
      var acc = 0.0
      for (v <- support) {
        cum += cCnt.getOrElse(v, 0).toDouble / cls.size - gCnt(v) / nTot
        acc += math.abs(cum)
      }
      val exp = BigDecimal(acc / math.max(m - 1, 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(s)._1 === cls.size.toLong, s"k of $s")
      assert(math.abs(got(s)._2 - exp) <= 1e-6 + 1e-12, s"emd of $s")
    }
    OperatorCaches.releaseAll()
  }
}
