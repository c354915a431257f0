package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregation over the `events` table ([EXT],
  * SURVEY §2.9). Batch-first: the same `window()`/`session_window()`
  * expressions work unchanged under Structured Streaming with
  * `withWatermark` (see [[graft.streaming.StreamRunner]]) — windows are
  * just grouping keys, so each is one map-side-combinable shuffle.
  */
object EventWindows {

  /** Tumbling windows: one row per (window, event_type). */
  def tumbling(events: DataFrame, duration: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows (duration, slide): each event lands in
    * duration/slide windows.
    */
  def sliding(events: DataFrame, duration: String = "10 minutes",
              slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), duration, slide))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"), col("sum_value"))

  /** Session windows per user: gap-based (a session closes after `gap`
    * of inactivity). Output start is the first event's time, n the
    * session's event count.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("sum_value"))
}
