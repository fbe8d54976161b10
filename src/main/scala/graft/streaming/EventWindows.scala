package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Windowed event aggregation (SURVEY §2.11's forward-looking extension over
  * the `events` table). The same declarative transforms run in batch and in
  * Structured Streaming (`readStream` → transform → `writeStream`): in
  * streaming mode callers add `.withWatermark(tsCol, ...)` upstream and
  * Spark maintains the window state incrementally; in batch mode Catalyst
  * plans an ordinary partial+final aggregation.
  */
object EventWindows {

  /** Order-insensitive money sum: exact integer cents, so the result doesn't
    * depend on the floating-point reduction order across partitions (a plain
    * sum(double) differs in the last ulp between engines/runs).
    */
  private def sumCents(c: org.apache.spark.sql.Column) =
    sum(round(c * 100, 0).cast("long"))

  /** Tumbling-window counts/sums per event type. */
  def tumbling(events: DataFrame, tsCol: String, duration: String): DataFrame =
    events
      .groupBy(window(col(tsCol), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sumCents(col("value")).cast("double") / 100.0, 4).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"),
      )

  /** Sliding-window aggregation (each event lands in duration/slide windows).
    * The average is an exact integer-scaled value (cents × 100, floor-
    * divided): two double divisions can differ in the last ulp between
    * engines and flip a round(…,4) — the integer form can't.
    */
  def sliding(events: DataFrame, tsCol: String, duration: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), duration, slide).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("(sum(cast(round(value * 100, 0) as long)) * 100) DIV count(1)").as("avg_value_e4"),
      )
      .select(col("w.start").as("window_start"), col("n_events"), col("avg_value_e4"))
}
