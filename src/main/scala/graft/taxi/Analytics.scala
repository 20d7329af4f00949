package graft.taxi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's analytics query set Q1-Q8 (SURVEY.md §2l step 11), each
  * a pure function over the cleaned frame. Aggregations are hash aggs
  * (partial → shuffle on the group key → final); top-k queries plan as
  * TakeOrderedAndProject, so only k rows ever reach the driver.
  */
object Analytics {

  import TaxiSchema.airportIds

  /** Share of trips picking up at an airport (cell 101); 0.0 for an empty
    * frame (sum over zero rows is null — getLong would NPE).
    */
  def airportPickupShare(df: DataFrame): Double = {
    val agg = df.agg(
      coalesce(sum(when(col("PULocationID").isin(airportIds: _*), 1L).otherwise(0L)),
        lit(0L)).as("ap"),
      count(lit(1)).as("n")).head()
    if (agg.getLong(1) == 0L) 0.0
    else agg.getLong(0).toDouble / agg.getLong(1) * 100
  }

  /** Q1 (cells 102-105): average tip% (tip/total·100, rounded per-row) by
    * airport-pickup flag.
    */
  def q1TipPctByAirportPickup(df: DataFrame): DataFrame =
    Features.withAirportPickupFlag(Features.withTipPercent(df))
      .groupBy("is_airport_pickup")
      .agg(avg("tip_percent").as("average_tip_percentage"))
      .orderBy("is_airport_pickup")

  /** Q2 (cell 107): average duration per (PU, DO) pair. */
  def q2AvgDurationByRoute(df: DataFrame): DataFrame =
    df.groupBy("PULocationID", "DOLocationID")
      .agg(avg("time_take_min").as("avg_duration_min"))

  /** Q3 (cell 109): trips per payment type, counted via count(RatecodeID)
    * (count-ignores-null, exactly as the reference wrote it).
    */
  def q3CountByPaymentType(df: DataFrame): DataFrame =
    df.groupBy("payment_type")
      .agg(count(col("RatecodeID")).as("trip_count"))
      .orderBy("payment_type")

  /** Q4 (cell 111): payment-type popularity rank within each rate code,
    * then code→label recodings (labels only for the codes the reference
    * labels; the rest become null, as there).
    */
  def q4PaymentRankByRateCode(df: DataFrame): DataFrame = {
    val counts = df.groupBy("RatecodeID", "payment_type").count()
    val w = Window.partitionBy("RatecodeID").orderBy(col("count").desc)
    val ranked = counts.withColumn("rank", rank().over(w))
    val rateLabel = TaxiSchema.rateCodeLabels.foldLeft(lit(null).cast("string")) {
      case (acc, (code, label)) => when(col("RatecodeID") === code, label).otherwise(acc)
    }
    val payLabel = TaxiSchema.paymentTypeLabels.foldLeft(lit(null).cast("string")) {
      case (acc, (code, label)) => when(col("payment_type") === code, label).otherwise(acc)
    }
    ranked
      .withColumn("RatecodeID", rateLabel)
      .withColumn("payment_type", payLabel)
  }

  /** Q5 (cells 114/141): congestion profile per time-of-day slot. The
    * avg_speed_mph alias is the reference's (units actually mi/min —
    * Features.withAverageSpeed).
    */
  def q5Congestion(df: DataFrame): DataFrame =
    df.groupBy("time_of_day_slot")
      .agg(
        avg("average_speed").as("avg_speed_mph"),
        avg("time_take_min").as("avg_duration_min"),
        count(lit(1)).as("trip_count"))
      .orderBy("time_of_day_slot")

  /** Q6 (cell 138): average fare + trip count by (slot, day-of-week). */
  def q6FareBySlotAndDow(df: DataFrame): DataFrame =
    df.groupBy("time_of_day_slot", "pickup_day_of_week")
      .agg(
        round(avg("fare_amount"), 2).as("avg_fare"),
        count(lit(1)).as("trip_count"))
      .orderBy("pickup_day_of_week", "time_of_day_slot")

  /** Q7 (cells 140/144): top-10 routes during peak slots. The cell-144
    * variant also renders a "route" label; both peak sets appear in the
    * reference — pass the one you need.
    */
  def q7TopRoutes(df: DataFrame, peaks: Seq[String] = Seq("Afternoon", "Evening")): DataFrame =
    df.filter(col("time_of_day_slot").isin(peaks: _*))
      .groupBy("PULocationID", "DOLocationID")
      .agg(count(lit(1)).as("trip_count"))
      .withColumn("route", concat_ws(" to ", col("PULocationID"), col("DOLocationID")))
      .orderBy(col("trip_count").desc)
      .limit(10)

  /** Correlation of duration and tip per payment type (cell 146). */
  def corrDurationTipByPayment(df: DataFrame): DataFrame =
    df.groupBy("payment_type")
      .agg(
        corr(col("time_take_min"), col("tip_amount")).as("corr_duration_tip"),
        round(avg("time_take_min"), 2).as("avg_duration"),
        round(avg("tip_amount"), 2).as("avg_tip"))
      .orderBy(col("corr_duration_tip").desc)

  /** Q8 (cell 147): airport vs non-airport trips (either endpoint), with
    * the second tip definition tip_pct = tip/fare·100 when fare>0.
    */
  def q8AirportVsNonAirport(df: DataFrame): DataFrame = {
    val tagged = df
      .withColumn("trip_type",
        when(col("PULocationID").isin(airportIds: _*) ||
          col("DOLocationID").isin(airportIds: _*), "airport")
          .otherwise("non_airport"))
      .withColumn("tip_pct",
        when(col("fare_amount") > 0,
          round(col("tip_amount") / col("fare_amount") * 100, 2))
          .otherwise(lit(null)))
    tagged.groupBy("trip_type")
      .agg(
        round(avg("trip_distance"), 2).as("avg_distance_miles"),
        round(avg("fare_amount"), 2).as("avg_fare_usd"),
        round(avg("tip_pct"), 2).as("avg_tip_percentage"),
        count(lit(1)).as("total_trips"))
      .orderBy("trip_type")
  }
}
