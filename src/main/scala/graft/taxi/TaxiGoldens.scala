package graft.taxi

/** BASELINE.md's golden numbers for the real January-2024 TLC file
  * (yellow_tripdata_2024-01.parquet), as machine-checkable constants —
  * the reference notebook's own acceptance checks (cells 5/13/43/103/142,
  * W2_NYCTaxi_ETL.ipynb; BASELINE.md:24-56).
  *
  * The raw file is NOT in this sandbox, so these are exercised by the
  * path-gated [[GoldenReplaySpec]] (pending without the file, green with
  * it) and by `RunPipeline --golden`. Everything else about the pipeline
  * is oracled on synthetic data every round; this object is what turns
  * the remaining documentary parity claims into executable ones the day
  * the file is present.
  */
object TaxiGoldens {

  /** Default location the replay looks for; override with GRAFT_TAXI_RAW. */
  val DefaultRawPath = "/root/data/yellow_tripdata_2024-01.parquet"

  def rawPath: String =
    sys.env.getOrElse("GRAFT_TAXI_RAW", DefaultRawPath)

  /** Raw rows in the Jan-2024 file (cell 5; BASELINE.md:24). */
  val RawRows = 2964624L

  /** The correlated-null block: passenger_count / RatecodeID /
    * store_and_fwd_flag / congestion_surcharge / Airport_fee are null on
    * exactly the same rows (cells 13-14; BASELINE.md:25).
    */
  val CorrelatedNullRows = 140162L
  val CorrelatedNullCols: Seq[String] = Seq("passenger_count", "RatecodeID",
    "store_and_fwd_flag", "congestion_surcharge", "Airport_fee")

  /** Rows surviving the dead branch (year-2024 filter + negative-duration
    * swap + duration < 300 min) applied to df_valid_distance (cell 43;
    * BASELINE.md:34).
    */
  val DeadBranchRows = 2959170L

  /** Final cleaned rows, shipped mode (cell 103; BASELINE.md:39). */
  val FinalCleanedRows = 2644148L

  /** Airport-pickup share of cleaned trips, percent (cell 101;
    * BASELINE.md:41). */
  val AirportShare = 7.8024376850

  /** Q5 congestion profile (cell 142 cached output; BASELINE.md:49-53):
    * slot -> (avg_speed ["mph" alias, actually mi/min], avg_duration_min,
    * trip_count). Trip counts sum to [[FinalCleanedRows]] — the five rows
    * ARE a partition of the cleaned table.
    */
  val Q5Congestion: Map[String, (Double, Double, Long)] = Map(
    "Afternoon" -> (0.16811065793553004, 15.249178506976577, 808467L),
    "Evening" -> (0.18297862245184646, 14.043813289354283, 694265L),
    "Morning" -> (0.1870885636679543, 13.862060007178703, 577642L),
    "LateNight" -> (0.2271292161569624, 13.5339922142427, 372475L),
    "Night" -> (0.24622301203302546, 12.688902973878466, 191299L))

  /** Q7 busiest peak-slot routes, in order (report:769-771): Upper East
    * Side South <-> North. */
  val Q7TopTwoRoutes: Seq[(Int, Int)] = Seq((237, 236), (236, 237))

  /** Doubles are averages over ~10^5-10^6 rows: identical inputs, but
    * partial-aggregate reduce order differs run to run — 1e-9 relative
    * absorbs the summation noise while still pinning ~7 significant
    * digits beyond what any semantic drift could survive.
    */
  val RelTol = 1e-9
}
