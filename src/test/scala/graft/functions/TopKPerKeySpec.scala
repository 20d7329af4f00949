package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.TopKPerKey

class TopKPerKeySpec extends SparkSpec {

  private lazy val customer = Tables.load(spark, "/root/testdata/sf0.01", "customer")
  private lazy val lineitem = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("matches the window row_number formulation exactly") {
    val viaWindow = customer
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .filter(col("rn") <= 3).drop("rn")
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

    val viaOperator = TopKPerKey(customer,
        keyCols = Seq("c_nationkey"),
        orderCols = Seq(col("c_acctbal").desc, col("c_custkey")), k = 3)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

    assert(viaOperator === viaWindow)
    assert(viaOperator.size === 25 * 3)
  }

  test("-0.0 and 0.0 float keys form ONE group, like SQL GROUP BY") {
    val spark0 = spark
    import spark0.implicits._
    // 4 rows under key zero (two bit patterns) + 2 under key 1.0
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L), (1.0, 5L), (1.0, 6L))
      .toDF("fkey", "v")
    // rows keep their original -0.0 values (as SQL does) — normalize for
    // the comparison; the point is the GROUPING: one zero group of top-2
    val got = TopKPerKey(df, keyCols = Seq("fkey"), orderCols = Seq(col("v")), k = 2)
      .collect().map(r => (r.getDouble(0) + 0.0, r.getLong(1))).sorted.toSeq
    assert(got === Seq((0.0, 1L), (0.0, 2L), (1.0, 5L), (1.0, 6L)))
  }

  test("plans as TopKPerKeyExec over a hash exchange, no sort") {
    val q = TopKPerKey(lineitem, Seq("l_returnflag"),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), k = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // map-side partial prune feeds the exchange: only partitions·keys·k
    // rows shuffle, not every input row
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.indexOf("TopKPerKeyPartial") > plan.indexOf("Exchange hashpartitioning"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan) // no full partition sort anywhere
  }

  test("per-key emission order is best-first and k caps each group") {
    val rows = TopKPerKey(lineitem, Seq("l_returnflag", "l_linestatus"),
        Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")), k = 4)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .collect()
    val grouped = rows.groupBy(r => (r.getString(0), r.getString(1)))
    assert(grouped.size === 6)
    for ((_, g) <- grouped) {
      assert(g.length === 4)
      assert(g.map(_.getDouble(2)).forall(_ === 50.0)) // max quantity is 50, ≥4 ties each
    }
  }

  test("composes with downstream operators (filter + agg on top)") {
    val n = TopKPerKey(customer, Seq("c_nationkey"),
        Seq(col("c_acctbal").desc, col("c_custkey")), k = 2)
      .filter(col("c_acctbal") > 0)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .collect()
    assert(n.nonEmpty && n.forall(_.getLong(1) <= 2))
  }
}
