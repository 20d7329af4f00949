package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink surface (reference SURVEY.md §2a, §2k).
  *
  * The reference's I/O surface is: Parquet scan with schema inference
  * (W2_NYCTaxi_ETL.ipynb cell 3), Parquet overwrite checkpoints (cells
  * 31/36/46/...), a partitioned Delta final sink (cell 119), CSV dimension
  * load (README.md:20, declared but unused), and Delta OPTIMIZE/ZORDER
  * maintenance (cells 131-132). Delta jars are absent offline, so the
  * partitioned sink is hive-layout Parquet — identical partition-pruning
  * semantics — and Z-order is approximated by range-repartition +
  * sort-within-partitions, which populates Parquet row-group min/max stats
  * for the same data-skipping effect on those key columns.
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan; schema comes from the footer (reference cell 3).
    *
    * Schema repair, mirroring the reference's to_timestamp normalization
    * (W2_NYCTaxi_ETL.ipynb cell 81): the `events` table carries
    * TIMESTAMP(NANOS) which Spark 4 only reads as long (legacy
    * nanosAsLong, set in the session) — normalize it back to a microsecond
    * TimestampType column so downstream datetime functions apply.
    */
  /** Schema-evolving read: union the footer schemas of every file under
    * `path` (columns added by later ingest batches come back null-filled
    * for older files). Off by default in Spark because it costs one footer
    * read per file — acceptable for an evolving corpus table, or flip the
    * table to a real catalog with a declared schema at scale.
    */
  def loadMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") repairEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events table's timestamp — keyed on the table NAME (via
    * [[load]]/[[loadEventsStream]]), not "any ts column". Two writer
    * generations exist: TIMESTAMP(NANOS), which Spark 4 only reads as long
    * (legacy nanosAsLong, set in the session) → divide to micros; and
    * TIMESTAMP(MICROS) with no tz annotation → TimestampNTZType, which
    * session-TZ datetime functions (and the TimestampType contract every
    * downstream operator assumes) don't apply to → reinterpret the same
    * micros as UTC instants (session TZ is UTC, so wall-clock == instant;
    * the cell-81 repair of SURVEY.md §1). A future table whose long ts
    * is already micros/seconds must not be silently divided.
    */
  private def repairEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** FILE-SOURCE streaming read of the events table — the production shape
    * of a streaming ingest (executors read parquet splits as they are
    * discovered; nothing routes through the driver, unlike a MemoryStream
    * harness). File streams require a declared schema: one batch footer
    * read pins it, then the same ts repair as [[load]] applies — so a
    * streaming query and its batch oracle see identical rows.
    */
  def loadEventsStream(
      spark: SparkSession,
      dir: String,
      sourceOptions: Map[String, String] = Map.empty): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // file streams watch a DIRECTORY. Two fixture layouts exist: the
    // driver's testdata lays each table out as a single FILE (watch the
    // fixture dir with a filename glob — pathGlobFilter matches file
    // names, so it must NOT be used when events.parquet is a directory of
    // part files: it would match nothing and the stream would silently
    // drain zero rows), and ScaleData writes a normal parquet DIRECTORY
    // (watch it directly — the shape a real ingest watches too).
    // `sourceOptions` passes source rate limits through (e.g.
    // maxFilesPerTrigger to force a MULTI-batch AvailableNow drain — the
    // incremental regime the upsert sink's determinism contract is
    // proven under).
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st =
      if (fs.getFileStatus(new org.apache.hadoop.fs.Path(path)).isDirectory)
        spark.readStream.options(sourceOptions).schema(schema).parquet(path)
      else
        spark.readStream.options(sourceOptions).schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
    repairEventsTs(st)
  }

  /** CSV dimension load with header inference (reference README.md:20). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Stage checkpoint: overwrite Parquet (reference cells 31/36/46/60/...). */
  def checkpoint(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned final sink (reference cell 119's Delta write, re-expressed
    * as hive-layout Parquet). `sortCols` stands in for Z-ORDER (cell 132):
    * range-partition + in-partition sort → tight row-group min/max stats →
    * Parquet predicate pushdown skips row groups, the same scan-pruning the
    * reference gets from Delta data skipping.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val laidOut =
      if (sortCols.nonEmpty)
        df.repartitionByRange((partitionCols ++ sortCols).map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    laidOut.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Incremental partition upsert: overwrite ONLY the partitions present
    * in `df`, leaving every other partition untouched — the daily-load
    * pattern for a 100 TB table (static overwrite mode would wipe the
    * whole table root; dynamic mode replaces just the dirs the batch
    * touches). Scoped via option so the session default stays static.
    */
  def upsertPartitions(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table write: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with NO exchange
    * on either side (the 100 TB answer to repeated fact-to-fact joins).
    * Requires the session catalog (saveAsTable); in-bucket sort makes the
    * join a zero-shuffle, zero-sort merge.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction (reference cell 131's OPTIMIZE): bin-pack into
    * `numFiles` outputs. At cluster scale pair with maxRecordsPerFile.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    val bak = path.stripSuffix("/") + "__compact_bak"
    df.repartition(numFiles).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    // hadoop Path handles spaces/special chars; a raw java.net.URI throws
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bakPath = new org.apache.hadoop.fs.Path(bak)
    // keep the original reachable until the swap succeeds: move it aside,
    // move the compacted data in, then drop the backup; restore on failure
    fs.delete(bakPath, true)
    if (!fs.rename(dst, bakPath))
      throw new java.io.IOException(s"compact: could not move $path aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(bakPath, dst) // restore the original
      throw new java.io.IOException(s"compact: could not swap in $tmp, restored $path")
    }
    fs.delete(bakPath, true)
  }

  /** TRUE Z-order (Morton) curve value over integer-valued columns — the
    * real multi-dimensional layout key behind the reference's Delta
    * `ZORDER BY` (cell 132), upgrading [[writePartitioned]]'s 1-D
    * sort-layout stand-in: interleaving the bits of each column's
    * grid-normalized rank makes rows close in z close in EVERY dimension,
    * so Parquet row-group/file min-max stats get tight on ALL z-columns
    * simultaneously and a predicate on any subset of them skips data —
    * a 1-D sort only ever serves its leading column.
    *
    * Normalization is an exact `bits`-bit grid over the caller-supplied
    * [min, max] ranges (one cheap aggregate upstream):
    * floor((x − min)·(2^bits − 1) / range) clamped to the grid. The
    * product stays below 2^53 for ranges under ~2^37 at the default 16
    * bits, so the double-precision division is exact-rounded and an
    * independent engine replaying the same IEEE ops gets bit-identical
    * values (the oracle does exactly that). Output bit j·n+i carries bit
    * j of column i (LSB-first) — the classic Morton layout; n·bits ≤ 62
    * keeps the value in a non-negative long. Pure codegen'd bit
    * arithmetic: a narrow zero-shuffle column at any corpus size.
    */
  def zValue(
      cols: Seq[org.apache.spark.sql.Column],
      mins: Seq[Long],
      maxs: Seq[Long],
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size == mins.size && cols.size == maxs.size,
      "zValue: cols/mins/maxs must align")
    val n = cols.size
    require(bits >= 1 && n * bits <= 62, s"zValue: $n cols x $bits bits > 62")
    val gridMax = (1L << bits) - 1
    mins.lazyZip(maxs).foreach { (mn, mx) =>
      require(mx >= mn, s"zValue: max $mx < min $mn")
      require((mx - mn) <= (1L << 37),
        "zValue: range too wide for the exact double grid — pre-bucket the column")
    }
    val scaled = cols.lazyZip(mins).lazyZip(maxs).map { (c, mn, mx) =>
      val range = math.max(mx - mn, 1L)
      least(greatest(
        floor((c.cast("long") - lit(mn)).cast("double") * lit(gridMax.toDouble) /
          lit(range.toDouble)), lit(0L)), lit(gridMax))
    }
    (0 until bits).flatMap { j =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftleft(shiftrightunsigned(s, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered table layout: compute the Morton key (one tiny min/max
    * aggregate for the grids), range-partition into `numFiles` files on
    * it, sort inside each file by it, write. Every z-column's min/max
    * footer stats come out tight, so multi-dimensional box predicates
    * prune files/row-groups — the Delta `OPTIMIZE ... ZORDER BY` effect
    * with plain Parquet. The curve column is dropped before write
    * (projection preserves the sorted order).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    // one tiny job: (min, max) per z-column, in column order
    val aggExprs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val mins = zCols.indices.map(i => stats.getLong(2 * i))
    val maxs = zCols.indices.map(i => stats.getLong(2 * i + 1))
    df.withColumn("__z", zValue(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
