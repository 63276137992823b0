package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming variants of the events analytics (SURVEY.md §2.2): the
  * SAME expressions as graft.ops.EventAnalytics batch forms, applied to
  * an unbounded source with event-time watermarks bounding state.
  *
  * The reference has no event-time handling at all (late rows are just
  * inserted; MergeTree absorbs them — SURVEY §2.1 "notably absent"), so
  * watermark policy here is engine-added value: 2-hour lateness bound,
  * state for closed windows dropped.
  *
  * At scale: windowed aggregation state is (windows × types) and
  * session state is per active user-session; both are watermark-bounded,
  * so state size tracks activity, not history.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type, 2 h watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native session windows (30-min gap) per user under watermark. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * the streaming form of the LLM-pipeline dedup stage: duplicates
    * arriving within 2 h are dropped, state is watermark-evicted.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
