package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Gap-based user sessionization over the events stream.
  *
  * Batch form: lag/cumulative-sum window functions — one shuffle on user_id,
  * SQL-expressible, oracle-checkable. Streaming form: custom state via
  * `flatMapGroupsWithState` (per-user open session in `GroupState`,
  * event-time timeout closes it) — the Structured Streaming analog that
  * produces the same sessions incrementally over an unbounded stream.
  */
object Sessions {

  /** Batch sessionization: a new session starts when the gap since the
    * user's previous event exceeds `gapMinutes`. Output: one row per
    * (user_id, session) with count and span.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // Gap measured in epoch MICROseconds on both engine and oracle sides:
    // unix_timestamp() truncates to seconds, and a second-truncated gap can
    // flip the > comparison for events landing exactly on the boundary.
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || unix_micros(col("ts")) - unix_micros(col("__prev")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
      )
  }

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionOut(user_id: Long, n_events: Long, session_start: Timestamp, session_end: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Epoch MICROseconds of a timestamp — the same precision the batch form
    * compares gaps in (`unix_micros`); `getTime` truncates to milliseconds
    * and diverges from batch at the gap boundary for sub-ms timestamps.
    */
  private def micros(ts: Timestamp): Long = {
    val inst = ts.toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def toTimestamp(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Streaming sessionization with explicit state: events grouped by user;
    * an in-batch gap closes and emits the open session; event-time timeout
    * (watermark-driven) flushes sessions whose user went quiet. State and
    * gap arithmetic are in epoch micros for exact parity with the batch
    * form.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int,
  ): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.n, toTimestamp(s.start), toTimestamp(s.last)))
          } else {
            val sorted = it.toSeq.sortBy(e => micros(e.ts))
            val closed = Seq.newBuilder[SessionOut]
            var cur    = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                // Cross-batch out-of-order: a later micro-batch can deliver
                // an event BEFORE the open session's bounds (still above the
                // watermark). Merge with min/max — s.copy(last = t) would
                // move the session backward and emit end < start.
                case Some(s) if t - s.last <= gapUs && t >= s.start - gapUs =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) if t < s.start - gapUs =>
                  // fully-late predecessor: its own session, already closed
                  closed += SessionOut(user, 1, toTimestamp(t), toTimestamp(t))
                case Some(s) =>
                  closed += SessionOut(user, s.n, toTimestamp(s.start), toTimestamp(s.last))
                  cur = Some(SessionState(t, t, 1))
                case None => cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Timeout is a millisecond API; round UP so a session never
              // times out early.
              state.setTimeoutTimestamp(Math.floorDiv(s.last + gapUs + 999L, 1000L))
            }
            closed.result().iterator
          }
      }
  }
}
