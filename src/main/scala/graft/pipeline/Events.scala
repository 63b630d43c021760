package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the events table (event_id, ts, user_id,
  * event_type, value, props) — the batch forms of the streaming windowed
  * aggregations (same `window()` semantics Structured Streaming uses; the
  * streaming variant with watermarks lives in graft.streaming).
  *
  * Scale notes: tumbling windows are a plain groupBy on (window, type) —
  * partial agg + one shuffle; sessionization is a per-user window sort —
  * shuffle on user_id, skew bounded by per-user event counts (a power
  * user with 10^6 events is one partition-local sort, not a cross-join).
  */
object Events {

  /** Tumbling 1-hour windows per event_type: (window_start, event_type,
    * n_events, sum_value). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity): one row per
    * (user_id, session) with event count and duration. Deterministic
    * ordering: (ts, event_id). */
  def sessions(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_sess")).over(w).cast("int"))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .cast("long").as("duration_sec"))
  }
}
