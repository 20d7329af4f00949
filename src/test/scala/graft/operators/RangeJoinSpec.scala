package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed interval join equals the naive inequality join exactly") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(datediff(col("l_shipdate"), lit("1970-01-01")).as("ship_day"),
        col("l_orderkey"), col("l_linenumber"))
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).as("start_day"))
      .withColumn("end_day", col("start_day") + 30)

    val naive = li.join(ord,
        col("ship_day") >= col("start_day") && col("ship_day") <= col("end_day"))
      .count()
    val bucketed = RangeJoin.intervalJoin(
        li, col("ship_day"), ord, col("start_day"), col("end_day"), bucketSize = 30)
      .count()
    assert(bucketed === naive)
    assert(bucketed > 0)
  }

  test("boundary inclusivity: points exactly at start and end both match") {
    import spark.implicits._
    val pts = Seq(9L, 10L, 15L, 20L, 21L).toDF("v")
    val ivs = Seq((1L, 10L, 20L)).toDF("iv_id", "s", "e")
    val matched = RangeJoin.intervalJoin(pts, col("v"), ivs, col("s"), col("e"), 7)
      .select("v").collect().map(_.getLong(0)).sorted
    assert(matched.toSeq === Seq(10L, 15L, 20L))
  }

  test("caller columns named like the internal bucket key survive intact") {
    import spark.implicits._
    // both inputs already carry the names the implementation would want
    val pts = Seq((10L, "keep-p"), (15L, "keep-p2"))
      .toDF("v", "__graft_bucket_0")
    val ivs = Seq((1L, 10L, 20L, "keep-i")).toDF("iv_id", "s", "e", "__graft_bucket_1")
    val out = RangeJoin.intervalJoin(pts, col("v"), ivs, col("s"), col("e"), 7)
    assert(out.columns.count(_ == "__graft_bucket_0") == 1)
    assert(out.columns.count(_ == "__graft_bucket_1") == 1)
    val rows = out.orderBy("v").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("__graft_bucket_0")).toSeq == Seq("keep-p", "keep-p2"))
    assert(rows.forall(_.getAs[String]("__graft_bucket_1") == "keep-i"))
  }
}
