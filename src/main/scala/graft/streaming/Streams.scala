package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface (SURVEY §2.8 T1-T5). The reference has no
 * streaming at all; these are the batch window plans of
 * graft.queries.Events re-declared over an unbounded source — the same
 * Spark plan runs in either mode, which is the point of declaring windows
 * with `window()`/`session_window()` rather than hand-rolled bucketing.
 *
 * Inputs are expected to carry an event-time `ts` TimestampType column
 * (for the harness's nanos-long events, convert with timestamp_micros —
 * see queries.Q.tsCol). Watermarks bound state: at 100 TB/day the state
 * store only retains windows newer than the watermark horizon.
 */
object Streams {

  /** T1 — tumbling 5-minute counts per event type, 10-minute watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"))

  /** T2 — sliding 10/5-minute counts with watermark. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"))

  /** T3 — 30-minute-gap sessions per user (stateful merge under watermark). */
  def sessions(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"))

  /**
   * T5 — stateful stream dedup by key within the watermark horizon: exact
   * duplicates arriving late (but inside the watermark) are dropped, and
   * state for keys older than the horizon is evicted — bounded memory on an
   * unbounded stream.
   */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
