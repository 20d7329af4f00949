package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.CosineSimilarity

class CosineSimilaritySpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (3L, Array(1.0, 1.0, 0.0), Array(1.0, 0.0, 0.0)),
      (4L, Array(-1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0))
    ).toDF("id", "a", "b")
  }

  test("native expression matches the higher-order-function formulation") {
    val rows = df.select(col("id"),
      CosineSimilarity(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    for (r <- rows)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12, s"id=${r.getLong(0)}")
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assertApprox(byId(1L), 1.0)
    assertApprox(byId(2L), 0.0)
    assertApprox(byId(3L), 1.0 / math.sqrt(2))
    assertApprox(byId(4L), -1.0)
  }

  test("implicit cast accepts float vectors") {
    import spark.implicits._
    val f = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val v = f.select(CosineSimilarity(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-7)
  }

  test("null in, null out") {
    import spark.implicits._
    val n = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(n.select(CosineSimilarity(col("a"), col("b"))).head().isNullAt(0))
  }

  test("zero norm, dim mismatch, and null elements yield null (interpreted + codegen)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some(Array(Option(0.0), Option(0.0))), Some(Array(Option(1.0), Option(2.0)))), // zero left norm
      (2L, Some(Array(Option(1.0), Option(2.0))), Some(Array(Option(0.0), Option(0.0)))), // zero right norm
      (3L, Some(Array(Option(1.0), Option(2.0))), Some(Array(Option(1.0)))),              // dim mismatch
      (4L, Some(Array(Option(1.0), None)), Some(Array(Option(1.0), Option(2.0)))),        // null element
      (5L, Some(Array(Option(3.0), Option(4.0))), Some(Array(Option(3.0), Option(4.0)))))  // control
      .toDF("id", "a", "b")
    // codegen path: repartition defeats local-relation constant folding
    val gen = rows.repartition(2)
      .select(col("id"), CosineSimilarity(col("a"), col("b")).as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(gen(1L).isEmpty && gen(2L).isEmpty && gen(3L).isEmpty && gen(4L).isEmpty)
    assert(math.abs(gen(5L).get - 1.0) < 1e-12)
    // interpreted path must agree (eval/codegen lockstep)
    val interp = rows
      .select(col("id"), CosineSimilarity(col("a"), col("b")).as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(interp == gen)
    // the top-k failure mode this prevents: a zero vector must not rank
    // above real matches under descending sort (NaN would)
    val best = rows.select(col("id"), CosineSimilarity(col("a"), col("b")).as("c"))
      .orderBy(col("c").desc).head()
    assert(best.getLong(0) == 5L)
  }

  test("SQL registration exposes cosine_sim") {
    CosineSimilarity.register(spark)
    df.createOrReplaceTempView("vecs")
    val v = spark.sql("SELECT cosine_sim(a, b) FROM vecs WHERE id = 1").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("GraftExtensions injects cosine_sim at session build (spark.sql.extensions)") {
    // newSession() gets a fresh SessionState: temp registrations are gone,
    // so resolution can only come from the injected extension function
    val s2 = spark.newSession()
    val v = s2.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    // repartition defeats the local-relation fold so a real codegen stage
    // plans; materialize so AQE finalizes the plan before inspecting it
    val q = df.repartition(2).select(CosineSimilarity(col("a"), col("b")))
    q.collect()
    // the "*(n)" prefix marks a WholeStageCodegen stage in the plan string
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  private def assertApprox(a: Double, b: Double, eps: Double = 1e-12): Unit =
    assert(math.abs(a - b) < eps)
}
