package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureEngSpec extends SparkSpec {

  test("targetEncodeLoo matches the closed form on a planted table") {
    import spark.implicits._
    // category a: 3 rows, 2 positives; category b: 2 rows, 0 positives
    val df = Seq(("a", 1L), ("a", 1L), ("a", 0L), ("b", 0L), ("b", 0L))
      .toDF("k", "y")
    val got = FeatureEng.targetEncodeLoo(df, col("k"), col("y"), m = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val gmean = 2.0 / 5.0
    def enc(sumC: Long, y: Long, nC: Long) =
      BigDecimal((sumC - y + 5 * gmean) / (nC - 1 + 5))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(
      ("a", 0L, 1L, enc(2, 0, 3)), ("a", 1L, 2L, enc(2, 1, 3)),
      ("b", 0L, 2L, enc(0, 0, 2))))
  }

  test("targetEncodeLoo: the LOO form excludes the row's own label") {
    import spark.implicits._
    // one positive in a category of 2: the positive row's encoding must
    // NOT see its own label (enc(y=1) < enc(y=0))
    val df = Seq(("a", 1L), ("a", 0L)).toDF("k", "y")
    val got = FeatureEng.targetEncodeLoo(df, col("k"), col("y"), m = 1L)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(got(1L) < got(0L))
  }

  test("targetEncodeLoo rejects m = 0 (singleton-category division by zero)") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "y")
    val e = intercept[IllegalArgumentException] {
      FeatureEng.targetEncodeLoo(df, col("k"), col("y"), m = 0L)
    }
    assert(e.getMessage.contains("m must be >= 1"))
  }

  test("quantileNormalize is the identity when groups share one distribution") {
    import spark.implicits._
    val vals = Seq(1L, 2L, 2L, 5L, 9L)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "v")
    val got = FeatureEng.quantileNormalize(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.forall(r => r._2 === r._3))
  }

  test("quantileNormalize maps a shifted group onto the pooled quantiles") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val a = Seq.fill(200)(("a", rnd.nextInt(50).toLong))
    val b = Seq.fill(150)(("b", rnd.nextInt(50).toLong + 100L)) // shifted
    val df = (a ++ b).toDF("g", "v")
    val got = FeatureEng.quantileNormalize(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // driver replay: type-1 pooled quantile at the within-group midrank
    val all = (a ++ b).map(_._2).sorted
    def replay(group: Seq[Long], v: Long): Long = {
      val n = group.size.toLong
      val cum = group.count(_ <= v).toLong
      val cnt = group.count(_ == v).toLong
      val pNum = 2 * cum - cnt // midrank CDF numerator over 2n
      all.find(x => 2L * all.count(_ <= x) * n >= pNum * all.size).get
    }
    got.foreach { case (g, v, _, norm) =>
      val grp = (if (g == "a") a else b).map(_._2)
      assert(norm === replay(grp, v), s"($g, $v)")
    }
    // normalization is monotone within each group
    for (g <- Seq("a", "b")) {
      val ordered = got.filter(_._1 == g).sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall(p => p._1 <= p._2))
    }
    // the shifted group's normalized values land inside the pooled range
    // far below its raw values (the aligner doing its job)
    val bRows = got.filter(_._1 == "b")
    assert(bRows.forall(r => r._4 <= r._2))
  }

  test("hashFeatures: collision profile matches a driver-side replay") {
    import spark.implicits._
    val df = Seq(("x", "u", 1), ("x", "v", 2), ("y", "u", 3), ("y", "w", 1))
      .toDF("c1", "c2", "c3")
    val got = FeatureEng.hashFeatures(df, Seq("c1", "c2", "c3"), 4L).head()
    val feats = Seq("c1=x", "c1=y", "c2=u", "c2=v", "c2=w",
      "c3=1", "c3=2", "c3=3")
    val loads = feats.groupBy(f =>
      ((PortableHash.portable60(f) % 4) + 4) % 4).values.map(_.size)
    assert(got.getLong(0) === feats.size.toLong)
    assert(got.getLong(1) === loads.size.toLong)
    assert(got.getLong(2) === loads.count(_ > 1).toLong)
    assert(got.getLong(3) === loads.max.toLong)
  }
}
