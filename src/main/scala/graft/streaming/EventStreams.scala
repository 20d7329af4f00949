package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * New scope beyond the reference (it is batch-only, SURVEY.md §2i) —
  * the streaming counterparts of its aggregation patterns: windowed
  * aggregates with watermarks, exactly-once-style dedup, and stateful
  * sessionization via flatMapGroupsWithState.
  *
  * Scale notes: all three are keyed-state operators; state is partitioned
  * by group key across executors (HDFS/RocksDB-backed state store on a real
  * cluster), and the watermark bounds state size — without it, windows and
  * dedup keys accumulate forever.
  */
object EventStreams {

  /** Sliding-window event counts/averages per event_type. Late data beyond
    * the watermark is dropped; window state is evicted once the watermark
    * passes window end.
    */
  def windowedCounts(
      events: DataFrame,
      window: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("avg_value"))

  /** Stream-static enrichment: join each event against a broadcast
    * dimension table (the streaming counterpart of the reference's implied
    * zone lookup, SURVEY.md §2c). The static side re-resolves per
    * micro-batch; broadcast keeps it shuffle-free on the stream side.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming analogue of Dedup.exact. dropDuplicatesWithinWatermark
    * (not plain dropDuplicates) is what lets the watermark EVICT per-id
    * state; with dropDuplicates("event_id") alone the state store grows
    * one entry per id forever.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with an event-time range: pair each left
    * event with right events of the same user arriving within
    * `withinMinutes` AFTER it (e.g. click → purchase attribution).
    *
    * Both sides are watermarked and the join condition bounds event time on
    * both sides — that pair of constraints is what lets Spark EVICT
    * buffered rows from the join state store once the watermark passes the
    * interval; an unbounded condition would buffer both streams forever.
    */
  def streamStreamJoin(
      left: DataFrame,
      right: DataFrame,
      withinMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("event_type").as("r_type"))
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"), col("l_type"), col("r_type"))
  }

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Internal running-session state (kept public for encoder codegen). */
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  /** Event-time sessionization with a gap timeout: a session closes when no
    * event arrives for `gapMinutes` (event-time, enforced via watermark +
    * EventTimeTimeout). Emits one row per closed session.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          // merge iff within the gap of the session INTERVAL (nearest
          // boundary) — `t - s.end <= gapMs` alone would also merge a late
          // event arbitrarily far BEFORE the session start
          case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
            cur = Some(s.copy(start = t min s.start, end = t max s.end,
              n = s.n + 1, sum = s.sum + e.value))
          case Some(s) if t < s.start =>
            // late outlier predating the current session by more than the
            // gap: it is already complete in event time (anything that
            // could bridge it is older than the watermark) — emit directly
            closed ::= Session(userId, new java.sql.Timestamp(t),
              new java.sql.Timestamp(t), 1, e.value)
          case Some(s) =>
            closed ::= Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (sorted.isEmpty && state.hasTimedOut) {
        // watermark passed the gap: close the open session
        state.getOption.foreach { s =>
          closed ::= Session(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end), s.n, s.sum)
        }
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
