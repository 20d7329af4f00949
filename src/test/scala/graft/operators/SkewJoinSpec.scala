package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private lazy val lineitem =
    Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
  private lazy val orders =
    Tables.load(spark, "/root/testdata/sf0.001", "orders")

  test("two-path salted equi-join returns exactly the plain join result") {
    val plain = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // threshold 3 on a ≤7-rows-per-key fact: hot AND cold paths both carry
    // rows, so the union seam itself is under test
    val salted = SkewJoin.saltedEquiJoin(
        lineitem.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        key = "k", discriminator = col("l_linenumber"), salts = 4,
        hotThreshold = 3L)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted join with no hot keys degrades to the plain join path") {
    val plain = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .count()
    val salted = SkewJoin.saltedEquiJoin(
        lineitem.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        key = "k", discriminator = col("l_linenumber"), salts = 4,
        hotThreshold = 1000000L)
    assert(salted.count() === plain)
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val direct = lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum"), count(lit(1)).as("count"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewJoin.saltedSumCount(lineitem, "l_returnflag", "l_quantity", salts = 4)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === direct)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // one key owns ~100k rows, the rest are singletons — with the skew
    // thresholds forced low, AQE must mark and split the hot partition
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (0 until 100000).map(i => (if (i % 10 == 0) 0L else i.toLong, i))
        .toDF("k", "v")
      val right = (0L until 1000L).map(k => (k, s"r$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() drives THIS dataset's queryExecution (count() would spawn
      // a separate execution and leave this plan unfinalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed tables join without any exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    Tables.writeBucketed(lineitem, "li_bucketed", Seq("l_orderkey"), numBuckets = 4)
    Tables.writeBucketed(orders, "ord_bucketed", Seq("o_orderkey"), numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      joined.count() // materialize so AQE finalizes
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
