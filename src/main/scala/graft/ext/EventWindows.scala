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

  /** Per-key rolling count/sum over a trailing event-time range frame
    * (`windowSec` seconds up to and including each event): the
    * "requests in the last hour per user" feature. RANGE (not ROWS)
    * framing on floor-second epoch, so same-second peers count in both
    * engines identically. One shuffle keyed by `keyCol`; per-row frame
    * state is bounded by the window's event count.
    */
  def rolling(events: DataFrame, windowSec: Long,
              keyCol: String = "user_id", tsCol: String = "ts",
              valCol: String = "value"): DataFrame = {
    require(windowSec > 0, "rolling: windowSec must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      // NTZ-safe floor-second epoch (a direct NTZ→long cast throws)
      .orderBy(graft.functions.TimeKeys.epochSeconds(events, tsCol))
      .rangeBetween(-windowSec, 0)
    events.select(col("event_id"), col(keyCol), col(tsCol),
      count(lit(1)).over(w).as("n_window"),
      round(sum(col(valCol)).over(w), 4).as("sum_window"))
  }

  /** Ordered funnel: one row with the count of users who reached each
    * step of `steps` IN ORDER (each step's event strictly after the
    * previous step's earliest qualifying event — the standard
    * product-analytics funnel; conversion between stages is
    * n_s(i+1)/n_s(i)). Output columns n_s1..n_sK.
    *
    * Shape: one aggregate per step, all keyed on the user column, so
    * after the first Exchange every later groupBy/join reuses the same
    * hash partitioning — per-user state is K timestamps, never the
    * event list, and the final count is a one-row global agg. At
    * 100 TB of events the cost is one shuffle of (user, K stamps), not
    * K shuffles of the raw stream.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).as("__u__"),
      col(typeCol).as("__e__"), col(tsCol).as("__t__"))
    var acc = base.groupBy(col("__u__"))
      .agg(min(when(col("__e__") === steps.head, col("__t__"))).as("t0"))
    for (i <- 1 until steps.size) {
      val carried = (0 until i).map(j => col(s"t$j"))
      acc = base.join(acc, "__u__")
        .groupBy((col("__u__") +: carried): _*)
        .agg(min(when(col("__e__") === steps(i)
          && col("__t__") > col(s"t${i - 1}"), col("__t__"))).as(s"t$i"))
    }
    acc.agg(
      count(col("t0")).as("n_s1"),
      (1 until steps.size).map(i => count(col(s"t$i")).as(s"n_s${i + 1}")): _*)
  }
}
