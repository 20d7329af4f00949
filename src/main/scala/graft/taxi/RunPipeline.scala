package graft.taxi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.sources.Tables

/** The SURVEY.md §7 "runner": end-to-end wiring of the reference's program
  * — read → clean → feature → partitioned write → Q1–Q8 — with the
  * per-stage count logging the notebook does manually (cells 5/43/103,
  * W2_NYCTaxi_ETL.ipynb).
  *
  * Usage:
  *   runMain graft.taxi.RunPipeline [--raw=parquetPath] [--out=dir]
  *     [--strict] [--golden]
  *
  * With no --raw the deterministic in-memory fixture runs — a
  * self-contained demo of the whole program. Given the real January-2024
  * TLC file it reproduces the reference's golden stage counts
  * (2,964,624 → 2,644,148 shipped mode; BASELINE.md anchors); add
  * --golden to ASSERT the [[TaxiGoldens]] stage counts as the stages run
  * (require, fail-fast) — the executable form of BASELINE.md's parity
  * table, same constants as the path-gated GoldenReplaySpec.
  *
  * Stage-count logging costs one count() action per stage (each a scan +
  * 1-row reduce); production runs chasing wall-clock can skip straight to
  * the write — the counts exist because the reference treats them as the
  * pipeline's acceptance checks.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.collectFirst { case a if a.startsWith(s"--$name=") =>
        a.stripPrefix(s"--$name=") }
    val strict = args.contains("--strict")
    val golden = args.contains("--golden")
    val rawPath = flag("raw")
    val outDir = flag("out").getOrElse("/tmp/graft-taxi-out")
    require(!golden || rawPath.isDefined,
      "--golden asserts the real Jan-2024 TLC goldens; pass --raw=<path>")

    // only stop a session this run created — under getOrCreate the runner
    // may be handed a host's live session (tests, notebooks) to leave alone
    val preExisting =
      org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.builder("graft-taxi-pipeline",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage(name: String, want: Option[Long] = None)(df: DataFrame): DataFrame = {
      val n = df.count()
      println(f"[stage] $name%-28s rows=$n")
      want.filter(_ => golden).foreach(w => require(n == w,
        s"GOLDEN MISMATCH at $name: got $n, BASELINE.md says $w"))
      df
    }

    val raw = stage("raw", Some(TaxiGoldens.RawRows))(rawPath match {
      case Some(p) => spark.read.parquet(p)
      case None    => TaxiFixture.raw(spark)
    })

    // the cleaning lineage, stage-logged at the notebook's own checkpoints
    val validDistance = stage("valid_speed+distance")(
      Cleaning.filterValidDistance(Cleaning.filterValidSpeed(
        Cleaning.withDuration(raw))))
    // the notebook computes the dead branch even though the shipped
    // lineage restarts from df_valid_distance (cell 49) — in golden mode
    // replay it as an audit either way, so the 2,959,170 anchor is checked
    if (golden && !strict)
      stage("dead_branch_audit", Some(TaxiGoldens.DeadBranchRows))(
        Cleaning.strictBranch(validDistance))
    val base =
      if (strict) stage("strict_branch", Some(TaxiGoldens.DeadBranchRows))(
        Cleaning.strictBranch(validDistance))
      else validDistance
    // the golden final count is a shipped-mode (non-strict) anchor
    val cleaned = stage("cleaned",
        if (strict) None else Some(TaxiGoldens.FinalCleanedRows))(
      Cleaning.filterPassengers(Cleaning.filterFareBand(
        Cleaning.fixNegativeAmounts(Cleaning.triageZeroDistance(base)))))
    val featured = stage("featured")(
      Features.withTimeFeatures(Features.withAverageSpeed(
        Cleaning.castTypes(cleaned))))

    // partitioned final sink with the Z-order stand-in layout (cells
    // 118-119 + 132): hive dirs by date parts, (PU,DO)-sorted row groups
    val dated = Features.withDateParts(featured)
    Tables.writePartitioned(dated, s"$outDir/taxi",
      partitionCols = Seq("pickup_year", "pickup_month", "pickup_day"),
      sortCols = Seq("PULocationID", "DOLocationID"))
    println(s"[sink] partitioned parquet at $outDir/taxi")

    // the analytics suite over the re-read table (partition recovery +
    // row-group skipping exercised exactly like the reference's re-reads)
    val table = spark.read.parquet(s"$outDir/taxi")
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
      println(f"[query] $name%-20s rows=${df.count()}")
    }
    println(f"[query] airport_share        value=${Analytics.airportPickupShare(table)}%.4f")
    // a sample of the headline result, like the notebook's display() cells
    queries.find(_._1 == "q5_congestion").foreach(_._2.show(truncate = false))
    if (!preExisting) spark.stop()
  }
}
