package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming pipelines over the events schema
  * (SURVEY.md §2.3 #28).
  *
  * The same transform serves batch and stream (`q_events_window` is the
  * batch twin the driver oracle-checks); the streaming form adds a
  * watermark so state for closed windows is dropped — the knob that
  * keeps a 100 TB/day stream bounded.
  */
object EventStreams {

  /** Hourly tumbling-window counts + value sums per event type.
    * Works on a batch OR streaming frame with (ts: long nanos,
    * event_type, value).
    */
  def windowedAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val ts = (col("ts") / lit(1000000000L)).cast("timestamp_ltz")
    val based = events.withColumn("ts_sec", ts)
    val marked = watermark.fold(based)(w => based.withWatermark("ts_sec", w))
    marked
      .groupBy(window(col("ts_sec"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").cast("long").as("wstart"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Sessionization-style running state per user: last event type and
    * a running value total, via streaming-compatible aggregation.
    */
  def perUserTotals(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val ts = (col("ts") / lit(1000000000L)).cast("timestamp_ltz")
    val based = events.withColumn("ts_sec", ts)
    val marked = watermark.fold(based)(w => based.withWatermark("ts_sec", w))
    marked
      .groupBy(window(col("ts_sec"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").cast("long").as("wstart"), col("user_id"),
        col("n_events"), col("total_value"))
  }
}
