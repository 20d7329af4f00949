package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CausalSpec extends SparkSpec {

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("randomized treatment: stratified ATE stays close to the naive gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    // treatment independent of x -> no confounding to correct
    val rows = (1 to 1000).map { _ =>
      val x = r6(rnd.nextDouble() * 2 - 1)
      val t = if (rnd.nextBoolean()) 1L else 0L
      val y = 2.0 * t + x + rnd.nextDouble() * 0.1
      (x, t, y)
    }
    val got = Causal.propensityStratifiedAte(rows.toDF("x1", "t", "y"),
      Seq("x1"), col("t"), col("y")).head()
    val naive = got.getDouble(3); val ate = got.getDouble(4)
    assert(math.abs(naive - ate) < 0.25,
      s"no confounding: naive $naive vs ate $ate should agree")
    assert(math.abs(ate - 2.0) < 0.25)
  }

  test("confounded treatment: stratification pulls the estimate toward truth") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // x drives BOTH treatment and outcome; true effect is 2
    val rows = (1 to 2000).map { _ =>
      val x = r6(rnd.nextDouble() * 2 - 1)
      val t = if (x + rnd.nextDouble() * 0.8 - 0.4 > 0) 1L else 0L
      val y = 2.0 * t + 3.0 * x + rnd.nextDouble() * 0.1
      (x, t, y)
    }
    val got = Causal.propensityStratifiedAte(rows.toDF("x1", "t", "y"),
      Seq("x1"), col("t"), col("y"), strata = 5, rounds = 6).head()
    val naive = got.getDouble(3); val ate = got.getDouble(4)
    // naive absorbs the 3x confounding (treated have higher x)
    assert(naive > 3.0, s"fixture sanity: naive $naive should be inflated")
    // stratification strips most of it
    assert(math.abs(ate - 2.0) < math.abs(naive - 2.0) / 2,
      s"ate $ate should be at least twice as close to 2 as naive $naive")
    assert(got.getLong(0) === 2000L)
    assert(got.getLong(1) <= 2000L && got.getLong(2) <= 5L)
  }
}
