package graft.taxi

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import java.sql.Timestamp

/** Property tests (SURVEY.md §5): the cleaned output invariants hold for
  * arbitrary inputs, not just the crafted fixture. One seeded 400-row
  * random frame (nulls, negatives, extremes included) → one pipeline run →
  * invariant sweep.
  */
class CleaningPropertySpec extends SparkSpec {

  private val genTs: Gen[Timestamp] = for {
    day <- Gen.chooseNum(1, 28)
    hour <- Gen.chooseNum(0, 23)
    min <- Gen.chooseNum(0, 59)
    year <- Gen.frequency(9 -> Gen.const(2024), 1 -> Gen.oneOf(2023, 2025))
  } yield Timestamp.valueOf(f"$year-01-$day%02d $hour%02d:$min%02d:00")

  private def orNull[T](g: Gen[T]): Gen[Any] =
    Gen.frequency(9 -> g.map(_.asInstanceOf[Any]), 1 -> Gen.const(null))

  private val genRow: Gen[Row] = for {
    vendor <- Gen.oneOf(1, 2, 6)
    pickup <- genTs
    durMin <- Gen.frequency(8 -> Gen.chooseNum(1, 120), 1 -> Gen.const(0),
      1 -> Gen.chooseNum(-60, -1))
    passengers <- orNull(Gen.chooseNum(0L, 6L))
    distance <- Gen.frequency(7 -> Gen.chooseNum(0.1, 45.0), 1 -> Gen.const(0.0),
      1 -> Gen.chooseNum(50.0, 100.0), 1 -> Gen.const(312722.3))
    rate <- orNull(Gen.oneOf(1L, 1L, 1L, 2L, 3L, 4L, 5L, 6L, 99L))
    flag <- Gen.oneOf("Y", "N")
    pu <- Gen.chooseNum(1, 266)
    dou <- Gen.chooseNum(1, 266)
    pay <- Gen.oneOf(0L, 1L, 1L, 2L, 3L, 4L, 6L)
    fare <- Gen.chooseNum(-200.0, 200.0)
    tip <- Gen.chooseNum(-30.0, 60.0)
  } yield {
    val dropoff = new Timestamp(pickup.getTime + durMin * 60000L)
    Row(vendor, pickup, dropoff, passengers, distance, rate, flag,
      pu, dou, pay, math.floor(fare * 100) / 100, 1.0, 0.5,
      math.floor(tip * 100) / 100, 0.0, 1.0, 19.5, 2.5, 0.0)
  }

  private lazy val cleaned = {
    val seed = rng.Seed(42L)
    val rows = Gen.listOfN(400, genRow).pureApply(Gen.Parameters.default, seed)
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), TaxiSchema.raw)
    Cleaning.pipeline(raw).cache()
  }

  test("no nulls anywhere after the pipeline (cell 77 invariant)") {
    for (c <- cleaned.columns)
      assert(cleaned.filter(col(c).isNull).count() === 0, s"null in $c")
  }

  test("rate codes restricted to the labeled domain by the 3VL fare band") {
    assert(cleaned.filter(!col("RatecodeID").isin(1, 2, 3, 4)).count() === 0)
  }

  test("speed and distance plausibility bounds hold") {
    assert(cleaned.filter(col("trip_distance") > 50).count() === 0)
    assert(cleaned
      .filter(col("trip_distance") / (col("time_take_min") / 60) > 50)
      .count() === 0)
  }

  test("paid trips carry non-negative monetary columns") {
    for (c <- Seq("fare_amount", "tip_amount", "total_amount"))
      assert(cleaned.filter(col(c) < 0 && col("payment_type").isin(0, 1, 2))
        .count() === 0, s"negative $c")
  }

  test("passengers positive; slot always one of the five labels") {
    assert(cleaned.filter(col("passenger_count") <= 0).count() === 0)
    assert(cleaned.filter(!col("time_of_day_slot")
      .isin("Night", "Morning", "Afternoon", "Evening", "LateNight")).count() === 0)
  }

  test("fare-band membership: every surviving fare is inside its rate band") {
    val expected = when(col("RatecodeID") === 1,
        lit(3.0) + greatest(col("trip_distance") * 3.5, col("time_take_min") * 0.7))
      .when(col("RatecodeID") === 2, lit(70.0))
      .when(col("RatecodeID") === 3,
        lit(3.0) + greatest(col("trip_distance") * 3.5, col("time_take_min") * 0.7) + 20.0)
      .when(col("RatecodeID") === 4,
        lit(3.0) + greatest(col("trip_distance") * 3.5, col("time_take_min") * 0.7) * 1.5)
    assert(cleaned
      .filter(col("fare_amount") > expected + 10.0 ||
        col("fare_amount") < expected - 1.0)
      .count() === 0)
  }
}
