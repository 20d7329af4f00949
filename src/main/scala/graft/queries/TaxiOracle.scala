package graft.queries

import java.time.format.DateTimeFormatter

import graft.taxi.{TaxiFixture, TaxiSchema}

/** DuckDB oracle SQL for the taxi-parity catalog entries.
  *
  * The taxi fixture is an in-memory frame (not one of the driver's parquet
  * tables), so the oracle embeds it as a VALUES CTE — rendered from
  * [[TaxiFixture.rows]], the same single source of truth the Spark side
  * reads — and then RE-DERIVES the entire cleaning lineage
  * (W2_NYCTaxi_ETL.ipynb cells 23-88, see graft.taxi.Cleaning) in portable
  * SQL. Every taxi analytics query is thereby checked end-to-end against an
  * independent engine: duration, the x/0→NULL speed-filter drop (DuckDB
  * division by zero is also NULL), zero-distance triage, sign-fix, the 3VL
  * fare-band drop of non-{1,2,3,4} rate codes, the passenger filter, and
  * the derived time features.
  *
  * Engine-parity rules baked in (see memory/gotchas + compare notes):
  *  - every VALUES column is CAST to the Spark raw type so DuckDB's
  *    DECIMAL literals never change the arithmetic;
  *  - DuckDB dayofweek is 0-based (Spark 1=Sunday) → +1, CAST to INT;
  *  - hour()/rank()/dayofweek() are BIGINT in DuckDB → CAST to INT;
  *  - float aggregates are rounded identically on both sides;
  *  - timestamps are compared as formatted strings (tz-awareness of the
  *    parquet dump vs DuckDB's naive TIMESTAMP would differ otherwise).
  */
object TaxiOracle {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** One VALUES tuple per fixture row, types rendered for DuckDB. */
  private def renderRow(r: org.apache.spark.sql.Row): String = {
    val cells = TaxiSchema.raw.fields.zipWithIndex.map { case (f, i) =>
      if (r.isNullAt(i)) "NULL"
      else f.dataType.typeName match {
        case "timestamp" =>
          "TIMESTAMP '" +
            r.getAs[java.sql.Timestamp](i).toLocalDateTime.format(tsFmt) + "'"
        case "string" => "'" + r.getAs[String](i).replace("'", "''") + "'"
        case _        => r.get(i).toString
      }
    }
    cells.mkString("(", ", ", ")")
  }

  private def q(name: String): String = "\"" + name + "\""

  private val rawCols: Seq[String] = TaxiSchema.raw.fields.map(_.name).toSeq

  /** CAST target per raw column (Spark schema parity). */
  private def duckType(dt: org.apache.spark.sql.types.DataType): String =
    dt.typeName match {
      case "integer"   => "INT"
      case "long"      => "BIGINT"
      case "double"    => "DOUBLE"
      case "string"    => "VARCHAR"
      case "timestamp" => "TIMESTAMP"
      case other       => sys.error(s"unmapped raw taxi type $other")
    }

  private val monetarySignFix: String = TaxiSchema.monetaryCols.map { c =>
    s"CASE WHEN ${q(c)} < 0 AND ${q("payment_type")} IN (0, 1, 2) " +
      s"THEN -${q(c)} ELSE ${q(c)} END AS ${q(c)}"
  }.mkString(",\n      ")

  private val meter =
    s"""greatest(${q("trip_distance")} * 3.50, time_take_min * 0.70)"""

  /** The shared WITH-prefix: raw fixture → cleaned frame (shipped, non-
    * strict branch — cell 49 restarts from df_valid_distance).
    */
  private lazy val cleanedCtes: String = {
    val values = TaxiFixture.rows.map(renderRow).mkString(",\n    ")
    val colList = rawCols.map(q).mkString(", ")
    val castSelect = TaxiSchema.raw.fields
      .map(f => s"CAST(${q(f.name)} AS ${duckType(f.dataType)}) AS ${q(f.name)}")
      .mkString(",\n      ")
    s"""raw0($colList) AS (VALUES
    $values),
  raw AS (SELECT
      $castSelect
    FROM raw0),
  dur AS (SELECT *,
      CAST(epoch(${q("tpep_dropoff_datetime")}) -
           epoch(${q("tpep_pickup_datetime")}) AS DOUBLE) / 60.0 AS time_take_min
    FROM raw),
  spd AS (SELECT * FROM dur
    WHERE ${q("trip_distance")} / (time_take_min / 60.0) <= 50),
  dst AS (SELECT * FROM spd WHERE ${q("trip_distance")} <= 50),
  tri AS (SELECT * FROM dst WHERE CASE
      WHEN ${q("trip_distance")} = 0 AND time_take_min < 2
        AND ${q("fare_amount")} >= 4.50 AND ${q("payment_type")} IN (1, 2) THEN 'keep'
      WHEN ${q("trip_distance")} = 0 AND time_take_min >= 2 AND time_take_min < 10
        AND ${q("fare_amount")} >= 4.50 AND ${q("payment_type")} IN (1, 2) THEN 'keep'
      WHEN ${q("trip_distance")} = 0 AND ${q("payment_type")} IN (3, 4, 6) THEN 'drop'
      WHEN ${q("trip_distance")} = 0 AND time_take_min >= 10
        AND ${q("fare_amount")} = 0 THEN 'drop'
      WHEN ${q("trip_distance")} = 0 AND time_take_min < 5
        AND ${q("fare_amount")} > 20 THEN 'drop'
      ELSE 'keep' END = 'keep'),
  sfx AS (SELECT * REPLACE (
      $monetarySignFix)
    FROM tri),
  fb AS (SELECT * EXCLUDE (emf) FROM (
      SELECT *, CASE
        WHEN ${q("RatecodeID")} = 1 THEN 3.00 + $meter
        WHEN ${q("RatecodeID")} = 2 THEN 70.00
        WHEN ${q("RatecodeID")} = 3 THEN 3.00 + $meter + 20.00
        WHEN ${q("RatecodeID")} = 4 THEN 3.00 + $meter * 1.5
        ELSE NULL END AS emf
      FROM sfx) withmodel
    WHERE NOT (${q("fare_amount")} > emf + 10.00 OR
               ${q("fare_amount")} < emf - 1.00)),
  cleaned AS (SELECT * REPLACE (
        CAST(${q("passenger_count")} AS INT) AS ${q("passenger_count")},
        CAST(${q("RatecodeID")} AS INT) AS ${q("RatecodeID")},
        CAST(${q("payment_type")} AS INT) AS ${q("payment_type")}),
      ${q("trip_distance")} / time_take_min AS average_speed,
      CAST(hour(${q("tpep_pickup_datetime")}) AS INT) AS pickup_hour_of_day,
      CAST(dayofweek(${q("tpep_pickup_datetime")}) + 1 AS INT) AS pickup_day_of_week,
      CASE WHEN hour(${q("tpep_pickup_datetime")}) BETWEEN 0 AND 5 THEN 'Night'
           WHEN hour(${q("tpep_pickup_datetime")}) BETWEEN 6 AND 11 THEN 'Morning'
           WHEN hour(${q("tpep_pickup_datetime")}) BETWEEN 12 AND 16 THEN 'Afternoon'
           WHEN hour(${q("tpep_pickup_datetime")}) BETWEEN 17 AND 20 THEN 'Evening'
           ELSE 'LateNight' END AS time_of_day_slot
    FROM fb WHERE ${q("passenger_count")} > 0)"""
  }

  /** Wrap a query body with the shared cleaned-fixture CTEs. */
  def sql(body: String): String = s"WITH $cleanedCtes\n$body"

  private val airportIn: String =
    TaxiSchema.airportIds.mkString("(", ", ", ")")

  // ------------------------------------------------------ per-query oracles

  /** Full cleaned frame; timestamps formatted as strings on both sides. */
  val pipeline: String = {
    val passthrough = rawCols
      .filterNot(Set("tpep_pickup_datetime", "tpep_dropoff_datetime"))
      .drop(1) // VendorID leads the select explicitly
      .map(q).mkString(", ")
    sql(s"""SELECT ${q("VendorID")},
      strftime(${q("tpep_pickup_datetime")}, '%Y-%m-%d %H:%M:%S') AS ${q("tpep_pickup_datetime")},
      strftime(${q("tpep_dropoff_datetime")}, '%Y-%m-%d %H:%M:%S') AS ${q("tpep_dropoff_datetime")},
      $passthrough,
      time_take_min, average_speed, pickup_hour_of_day, pickup_day_of_week,
      time_of_day_slot
    FROM cleaned
    ORDER BY 2, ${q("PULocationID")}""")
  }

  /** Q1 (cells 102-105): avg per-row-rounded tip% by airport-pickup flag. */
  val q1TipPct: String = sql(
    s"""SELECT ${q("PULocationID")} IN $airportIn AS is_airport_pickup,
      round(avg(round(${q("tip_amount")} / ${q("total_amount")} * 100, 2)), 4)
        AS average_tip_percentage
    FROM cleaned GROUP BY 1 ORDER BY 1""")

  /** Q2 (cell 107): avg duration per route. */
  val q2RouteDuration: String = sql(
    s"""SELECT ${q("PULocationID")}, ${q("DOLocationID")},
      round(avg(time_take_min), 4) AS avg_duration_min
    FROM cleaned GROUP BY 1, 2 ORDER BY 1, 2""")

  /** Q3 (cell 109): trips per payment type via count(RatecodeID). */
  val q3PaymentCount: String = sql(
    s"""SELECT ${q("payment_type")}, count(${q("RatecodeID")}) AS trip_count
    FROM cleaned GROUP BY 1 ORDER BY 1""")

  /** Q4 (cell 111): payment rank within rate code, code→label recodes. */
  val q4PaymentRank: String = {
    val rateCase = TaxiSchema.rateCodeLabels.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ")
    val payCase = TaxiSchema.paymentTypeLabels.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ")
    sql(s"""SELECT CASE rc $rateCase END AS ${q("RatecodeID")},
      CASE pt $payCase END AS ${q("payment_type")},
      ${q("count")}, rank
    FROM (SELECT rc, pt, ${q("count")},
        CAST(rank() OVER (PARTITION BY rc ORDER BY ${q("count")} DESC) AS INT) AS rank
      FROM (SELECT ${q("RatecodeID")} AS rc, ${q("payment_type")} AS pt,
          count(*) AS ${q("count")}
        FROM cleaned GROUP BY 1, 2) c) r
    ORDER BY ${q("RatecodeID")} NULLS FIRST, rank, ${q("payment_type")} NULLS FIRST""")
  }

  /** Q5 (cells 114/141): congestion profile per slot (reference aliases). */
  val q5Congestion: String = sql(
    s"""SELECT time_of_day_slot,
      round(avg(average_speed), 4) AS avg_speed_mph,
      round(avg(time_take_min), 4) AS avg_duration_min,
      count(*) AS trip_count
    FROM cleaned GROUP BY 1 ORDER BY 1""")

  /** Q6 (cell 138): avg fare + trips by (slot, day-of-week). */
  val q6FareSlotDow: String = sql(
    s"""SELECT time_of_day_slot, pickup_day_of_week,
      round(avg(${q("fare_amount")}), 2) AS avg_fare, count(*) AS trip_count
    FROM cleaned GROUP BY 1, 2 ORDER BY pickup_day_of_week, time_of_day_slot""")

  /** Q7 (cells 140/144): top-10 peak-slot routes (deterministic tiebreak). */
  val q7TopRoutes: String = sql(
    s"""SELECT ${q("PULocationID")}, ${q("DOLocationID")}, count(*) AS trip_count,
      concat(${q("PULocationID")}, ' to ', ${q("DOLocationID")}) AS route
    FROM cleaned WHERE time_of_day_slot IN ('Afternoon', 'Evening')
    GROUP BY 1, 2
    ORDER BY trip_count DESC, ${q("PULocationID")}, ${q("DOLocationID")}
    LIMIT 10""")

  /** Correlation of duration and tip per payment type (cell 146). */
  val corrDurationTip: String = sql(
    s"""SELECT ${q("payment_type")},
      round(corr(time_take_min, ${q("tip_amount")}), 4) AS corr_duration_tip,
      round(avg(time_take_min), 2) AS avg_duration,
      round(avg(${q("tip_amount")}), 2) AS avg_tip
    FROM cleaned GROUP BY 1
    ORDER BY corr_duration_tip DESC NULLS LAST, ${q("payment_type")}""")

  /** Q8 (cell 147): airport vs non-airport stats, tip_pct = tip/fare. */
  val q8AirportStats: String = sql(
    s"""SELECT trip_type,
      round(avg(${q("trip_distance")}), 2) AS avg_distance_miles,
      round(avg(${q("fare_amount")}), 2) AS avg_fare_usd,
      round(avg(tip_pct), 2) AS avg_tip_percentage,
      count(*) AS total_trips
    FROM (SELECT *,
        CASE WHEN ${q("PULocationID")} IN $airportIn
               OR ${q("DOLocationID")} IN $airportIn
          THEN 'airport' ELSE 'non_airport' END AS trip_type,
        CASE WHEN ${q("fare_amount")} > 0
          THEN round(${q("tip_amount")} / ${q("fare_amount")} * 100, 2)
          ELSE NULL END AS tip_pct
      FROM cleaned) t
    GROUP BY 1 ORDER BY 1""")

  /** Airport pickup share (cell 101), one row. */
  val airportShare: String = sql(
    s"""SELECT round(CAST(sum(CASE WHEN ${q("PULocationID")} IN $airportIn
        THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 100, 4)
      AS airport_pickup_share_pct
    FROM cleaned""")

  /** Broadcast zone-dimension join (the join the reference implies). */
  val zoneJoin: String = sql(
    s"""SELECT ${q("Borough")}, count(*) AS trips,
      round(avg(${q("fare_amount")}), 2) AS avg_fare
    FROM cleaned
    JOIN (SELECT * FROM (VALUES
        (1, 'EWR'), (132, 'Queens'), (138, 'Queens'),
        (236, 'Manhattan'), (237, 'Manhattan')) z(${q("LocationID")}, ${q("Borough")})) zones
      ON ${q("PULocationID")} = ${q("LocationID")}
    GROUP BY 1 ORDER BY 1""")
}
