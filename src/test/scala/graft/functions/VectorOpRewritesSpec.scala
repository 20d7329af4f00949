package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorOpRewritesSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.5, 0.0, -1.0), Array(2.0, 3.0, 2.0))
    ).toDF("id", "a", "b")
  }

  test("HOF dot-product pattern is rewritten to the native dot_product") {
    // repartition keeps the local relation from being constant-folded away
    val q = df.repartition(2).select(Similarity.dot(col("a"), col("b")).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewrite preserves results exactly") {
    val rows = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("rewritten"),
      org.apache.spark.sql.graftnative.DotProduct(col("a"), col("b")).as("native"))
      .collect()
    for (r <- rows) assert(r.getDouble(1) === r.getDouble(2))
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) === 32.0)
    assert(byId(2L) === -1.0)
  }

  test("rewrite preserves null semantics: length mismatch and null elements give NULL") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1.0), Seq(1.0, 2.0)),          // length mismatch
        Row(Seq(1.0, null), Seq(1.0, 2.0)),    // null element
        Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))),   // clean
      schema)
    val rows = d.select(
      Similarity.dot(col("a"), col("b")).as("hof_or_rewritten"),
      org.apache.spark.sql.graftnative.DotProduct(col("a"), col("b")).as("native"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) === 11.0 && rows(2).getDouble(1) === 11.0)
  }

  test("non-matching aggregations are left untouched") {
    // sum of squares of one array: same ArrayAggregate shape but no zip_with
    val q = df.select(
      aggregate(transform(col("a"), x => x * x), lit(0.0), (acc, x) => acc + x).as("s"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(q.collect().map(_.getDouble(0)).toSet === Set(14.0, 1.25))
  }
}
