package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SURVEY.md §2c capability, scale
  * path): a selective predicate on one shuffle-join side becomes a bloom
  * filter applied to the OTHER side's scan, killing non-matching fact rows
  * before the exchange. GraftSession enables it with production
  * thresholds; this spec lowers them so the tiny local tables qualify.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    // sibling session (shared context): thresholds sized so sf0.001 tables
    // qualify, and the broadcast path disabled — a broadcast join would
    // subsume the bloom filter
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    def q(sess: org.apache.spark.sql.SparkSession) = {
      val li = graft.sources.Tables.load(sess, "/root/testdata/sf0.001", "lineitem")
      val ord = graft.sources.Tables.load(sess, "/root/testdata/sf0.001", "orders")
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
    }
    val bloomed = q(s)
    val planned = bloomed.queryExecution.executedPlan.toString
    assert(planned.contains("bloom_filter_agg") || planned.contains("BloomFilterMightContain"),
      s"no bloom filter in plan:\n$planned")
    // pruning is semantics-neutral: same answer as the default session
    val got = bloomed.head()
    val expected = q(spark).head()
    assert(got.get(1) === expected.get(1))
    assert(got.get(2) === expected.get(2))
  }
}
