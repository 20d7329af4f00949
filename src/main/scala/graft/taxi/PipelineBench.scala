package graft.taxi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Month-scale end-to-end pipeline benchmark: a ~3M-row synthetic January
  * shaped like [[TaxiFixture]], run through the exact RunPipeline stage
  * chain (read → clean → features → partitioned sink → Q1–Q8), with wall
  * times and a PROPORTIONALITY CHECK of every cleaning-stage count against
  * the 22-row fixture goldens.
  *
  * The generator cross-joins the fixture's 22 branch-covering scenarios
  * with `copies` replicas and re-times each copy: pickup shifts to a
  * hash-deterministic minute of the month, dropoff moves WITH it (duration
  * preserved to the second). Every cleaning predicate — speed, distance,
  * zero-distance triage, fare band (duration minutes × distance), sign
  * fix, passengers, the 3VL drops — depends only on durations, amounts and
  * codes, never on the absolute date, so each copy follows its scenario's
  * branch exactly and every stage count must equal fixture_count × copies.
  * A divergence means a cleaning rule silently picked up a date
  * dependence — the bench fails loudly rather than recording a number.
  * (2023 scenario rows re-time within Dec 2023 so the strict-branch
  * semantics stay reachable too.)
  *
  * Usage: runMain graft.taxi.PipelineBench [copies] [--strict]  (default
  * 140000 ⇒ 3.08M rows — the scale of the reference's single-node January
  * run, BASELINE.md: 2.96M raw; --strict inserts the strict-branch
  * year/type gate and checks its stage count too).
  */
object PipelineBench {

  /** The cleaning chain, stage-named — same composition as RunPipeline
    * (which logs counts but not times); `strict` inserts the strict-branch
    * year/type gate exactly where RunPipeline does.
    */
  private def stages(raw: DataFrame, strict: Boolean): Seq[(String, DataFrame)] = {
    val valid = Cleaning.filterValidDistance(Cleaning.filterValidSpeed(
      Cleaning.withDuration(raw)))
    val base = if (strict) Cleaning.strictBranch(valid) else valid
    val cleaned = Cleaning.filterPassengers(Cleaning.filterFareBand(
      Cleaning.fixNegativeAmounts(Cleaning.triageZeroDistance(base))))
    val featured = Features.withTimeFeatures(Features.withAverageSpeed(
      Cleaning.castTypes(cleaned)))
    Seq("raw" -> raw, "valid_speed_distance" -> valid) ++
      (if (strict) Seq("strict_branch" -> base) else Nil) ++
      Seq("cleaned" -> cleaned, "featured" -> featured)
  }

  /** `copies` re-timed replicas of every fixture scenario. */
  def monthRaw(spark: SparkSession, copies: Long): DataFrame = {
    val fixture = TaxiFixture.raw(spark)
    val p = col("tpep_pickup_datetime")
    val d = col("tpep_dropoff_datetime")
    // 28 days of whole minutes: max dropoff = Jan 29 + 2 h, inside the month
    val shift = pmod(xxhash64(col("__copy"), p, d, col("trip_distance"),
      col("fare_amount"), col("RatecodeID"), col("payment_type"),
      col("PULocationID")), lit(28L * 24 * 60))
    val base = when(year(p) === 2024, lit("2024-01-01 00:00:00"))
      .otherwise(lit("2023-12-01 00:00:00")).cast("timestamp")
    spark.range(copies).withColumnRenamed("id", "__copy")
      .crossJoin(broadcast(fixture))
      .withColumn("__dur", unix_timestamp(d) - unix_timestamp(p))
      .withColumn("__p", timestamp_add("MINUTE", shift, base))
      .withColumn("__d", timestamp_add("SECOND", col("__dur"), col("__p")))
      .select(TaxiSchema.raw.fieldNames.map {
        case "tpep_pickup_datetime"  => col("__p").as("tpep_pickup_datetime")
        case "tpep_dropoff_datetime" => col("__d").as("tpep_dropoff_datetime")
        case other                   => col(other)
      }.toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    val strict = args.contains("--strict")
    val copies = args.filterNot(_ == "--strict")
      .headOption.map(_.toLong).getOrElse(140000L)
    val scratch = java.nio.file.Files.createTempDirectory("graft-taxi-bench").toString
    val spark = GraftSession.builder("graft-taxi-pipeline-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secsSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // fixture goldens at 1 copy — the proportionality denominators
    val goldens = stages(TaxiFixture.raw(spark), strict).map { case (n, df) => n -> df.count() }

    // materialize the synthetic month as real parquet so the timed read is
    // a genuine scan, not a re-derivation (generation excluded from timing)
    val tGen = System.nanoTime()
    monthRaw(spark, copies).write.mode("overwrite").parquet(s"$scratch/raw")
    println(f"[gen]   ${copies * goldens.head._2} rows in ${secsSince(tGen)}%.1f s")

    val t0 = System.nanoTime()
    val staged = stages(spark.read.parquet(s"$scratch/raw"), strict)
    val counts = staged.map { case (name, df) =>
      val t = System.nanoTime()
      val c = df.count()
      println(f"[stage] $name%-22s rows=$c%-9d ${secsSince(t)}%6.1f s")
      name -> c
    }
    val mismatches = counts.zip(goldens).collect {
      case ((n, c), (_, g)) if c != g * copies => s"$n: $c != $g*$copies"
    }
    require(mismatches.isEmpty,
      s"stage counts NOT proportional to fixture goldens: ${mismatches.mkString("; ")}")
    println(s"[check] all ${counts.size} stage counts = fixture golden x $copies" +
      (if (strict) " (strict mode)" else ""))

    val tSink = System.nanoTime()
    val dated = Features.withDateParts(staged.last._2)
    Tables.writePartitioned(dated, s"$scratch/taxi",
      partitionCols = Seq("pickup_year", "pickup_month", "pickup_day"),
      sortCols = Seq("PULocationID", "DOLocationID"))
    println(f"[sink]  partitioned parquet in ${secsSince(tSink)}%.1f s")

    val table = spark.read.parquet(s"$scratch/taxi")
    val queries: Seq[(String, DataFrame)] = Seq(
      "q1_tip_pct" -> Analytics.q1TipPctByAirportPickup(table),
      "q2_route_duration" -> Analytics.q2AvgDurationByRoute(table),
      "q3_payment_count" -> Analytics.q3CountByPaymentType(table),
      "q4_payment_rank" -> Analytics.q4PaymentRankByRateCode(table),
      "q5_congestion" -> Analytics.q5Congestion(table),
      "q6_fare_slot_dow" -> Analytics.q6FareBySlotAndDow(table),
      "q7_top_routes" -> Analytics.q7TopRoutes(table),
      "q8_airport_stats" -> Analytics.q8AirportVsNonAirport(table),
      "corr_duration_tip" -> Analytics.corrDurationTipByPayment(table))
    queries.foreach { case (name, df) =>
      val t = System.nanoTime()
      val c = df.count()
      println(f"[query] $name%-22s rows=$c%-6d ${secsSince(t)}%6.2f s")
    }
    val tShare = System.nanoTime()
    println(f"[query] airport_share         value=${Analytics.airportPickupShare(table)}%.4f ${secsSince(tShare)}%6.2f s")
    println(f"[total] read->clean->features->sink->Q1-Q8+corr+share: ${secsSince(t0)}%.1f s")
    spark.stop()
  }
}
