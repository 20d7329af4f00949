package graft.taxi

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic taxi-shaped fixture covering every cleaning-rule branch
  * (FIXTURES.md §A1): speed/distance edges, zero-distance triage rules,
  * sign-fix rows, fare-band in/out rows, 3VL-dropped rate codes, the
  * correlated-null block, zero passengers, and slot boundaries.
  */
object TaxiFixture {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Build one raw row with sensible defaults; override per scenario. */
  // format: off
  def trip(
      vendor: Int = 2,
      pickup: String = "2024-01-15 08:30:00",
      dropoff: String = "2024-01-15 08:45:00",
      passengers: java.lang.Long = 1L,
      distance: java.lang.Double = 3.0,
      rateCode: java.lang.Long = 1L,
      storeFwd: String = "N",
      pu: Int = 236, dou: Int = 237,
      payment: java.lang.Long = 1L,
      fare: java.lang.Double = 14.0,
      extra: java.lang.Double = 1.0,
      mta: java.lang.Double = 0.5,
      tip: java.lang.Double = 3.0,
      tolls: java.lang.Double = 0.0,
      improve: java.lang.Double = 1.0,
      total: java.lang.Double = 19.5,
      congestion: java.lang.Double = 2.5,
      airportFee: java.lang.Double = 0.0): Row =
    Row(vendor, ts(pickup), ts(dropoff), passengers, distance, rateCode,
      storeFwd, pu, dou, payment, fare, extra, mta, tip, tolls, improve,
      total, congestion, airportFee)
  // format: on

  /** Raw fixture rows. Kept rows are crafted to pass the fare band:
    * RatecodeID 1 ⇒ fare must lie in [3+max(3.5·mi, 0.7·min) − 1, … + 10].
    */
  def rows: Seq[Row] = Seq(
    // clean keepers across slots/hours (15-min, 3-mile ⇒ expected 13.50)
    trip(pickup = "2024-01-15 03:10:00", dropoff = "2024-01-15 03:25:00"), // Night (Mon)
    trip(pickup = "2024-01-15 08:30:00", dropoff = "2024-01-15 08:45:00"), // Morning
    trip(pickup = "2024-01-16 13:00:00", dropoff = "2024-01-16 13:15:00"), // Afternoon
    trip(pickup = "2024-01-16 18:00:00", dropoff = "2024-01-16 18:15:00"), // Evening
    trip(pickup = "2024-01-17 22:00:00", dropoff = "2024-01-17 22:15:00"), // LateNight
    // airport pickup (JFK flat fare, RatecodeID 2 ⇒ expected 70)
    trip(pickup = "2024-01-20 10:00:00", dropoff = "2024-01-20 10:40:00",
      pu = 132, rateCode = 2L, distance = 17.0, fare = 70.0, tip = 14.0,
      total = 90.0),
    // airport dropoff (Newark, RatecodeID 3: 40 min ⇒ expected 3+28+20 = 51)
    trip(pickup = "2024-01-21 17:30:00", dropoff = "2024-01-21 18:10:00",
      dou = 1, rateCode = 3L, distance = 6.0, fare = 51.0, payment = 2L),
    // cash trip, slower route (25 min, 2 mi ⇒ max(7, 17.5)+3 = 20.5)
    trip(pickup = "2024-01-18 09:00:00", dropoff = "2024-01-18 09:25:00",
      distance = 2.0, fare = 20.0, payment = 2L, tip = 0.0),
    // sign-fix case: negative amounts on a card payment inside fare band
    trip(pickup = "2024-01-19 11:00:00", dropoff = "2024-01-19 11:15:00",
      fare = -14.0, tip = -3.0, total = -19.5),
    // speed violation: 60 mi in 60 min = 60 mph → dropped at cell 26
    trip(pickup = "2024-01-15 12:00:00", dropoff = "2024-01-15 13:00:00",
      distance = 60.0),
    // distance violation: 51 mi at legal speed → dropped at cell 29
    trip(pickup = "2024-01-15 12:00:00", dropoff = "2024-01-15 14:00:00",
      distance = 51.0),
    // zero duration + zero distance: 0/0 → NULL predicate (3VL) → dropped at cell 26
    trip(pickup = "2024-01-15 12:00:00", dropoff = "2024-01-15 12:00:00",
      distance = 0.0),
    // zero duration + positive distance: x/0 → NULL predicate (3VL) → dropped at cell 26
    trip(pickup = "2024-01-15 12:00:00", dropoff = "2024-01-15 12:00:00",
      distance = 1.0),
    // triage rule 1 keep: zero-distance flag-drop ride (<2 min, fare ≥ 4.50,
    // card) — but fare 10 with 1 min ⇒ expected 3.7 ⇒ fare-band drops it
    // later (10 > 13.7? no: 10 < 13.7, and 10 > 3.7-1 ✓) → survives
    trip(pickup = "2024-01-15 07:00:00", dropoff = "2024-01-15 07:01:00",
      distance = 0.0, fare = 10.0, total = 12.0, tip = 1.0),
    // triage rule 3 drop: zero-distance voided payment
    trip(pickup = "2024-01-15 07:00:00", dropoff = "2024-01-15 07:03:00",
      distance = 0.0, payment = 6L, fare = 5.0),
    // triage rule 4 drop: zero-distance meter glitch (≥10 min, fare 0)
    trip(pickup = "2024-01-15 07:00:00", dropoff = "2024-01-15 07:20:00",
      distance = 0.0, fare = 0.0),
    // triage rule 5 drop: zero-distance high-fare short-time
    trip(pickup = "2024-01-15 07:00:00", dropoff = "2024-01-15 07:02:00",
      distance = 0.0, fare = 50.0, payment = 0L),
    // 3VL drop: RatecodeID 99 ⇒ expected NULL ⇒ fare-band predicate NULL
    trip(pickup = "2024-01-15 09:00:00", dropoff = "2024-01-15 09:15:00",
      rateCode = 99L),
    // correlated-null block (store_and_fwd_flag null ⇒ the 4 others null):
    // null RatecodeID ⇒ 3VL-dropped at the fare band
    trip(pickup = "2024-01-15 09:00:00", dropoff = "2024-01-15 09:15:00",
      passengers = null, rateCode = null, storeFwd = null,
      congestion = null, airportFee = null),
    // zero passengers → dropped at cell 69
    trip(pickup = "2024-01-15 10:00:00", dropoff = "2024-01-15 10:15:00",
      passengers = 0L),
    // out-of-band fare (too high): 15 min, 3 mi ⇒ expected 13.5; fare 30
    trip(pickup = "2024-01-15 10:00:00", dropoff = "2024-01-15 10:15:00",
      fare = 30.0, total = 35.5),
    // non-2024 row (strict mode drops it; shipped pipeline keeps it)
    trip(pickup = "2023-12-31 23:00:00", dropoff = "2023-12-31 23:15:00"))

  def raw(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), TaxiSchema.raw)
}
