package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming sessionization — the continuous form of
 * [[graft.query.Sessions]]: Spark's native `session_window` keeps one
 * merging window per (key, open session) in the state store, extends
 * it while events arrive within `gap`, and FINALIZES it once the
 * watermark passes session-end + gap, so state is bounded by the
 * number of concurrently-open sessions (not stream history).
 *
 * Contract vs the batch operator: `session_start` and `n_events` are
 * identical; the native window's `end` is `last event + gap` (the
 * window's expiry instant) where the batch form reports the last
 * event time itself — callers get both (`session_end` = last-event
 * time derived by subtracting the gap; `expires_at` = native end).
 */
object StreamingSessions {

  /**
   * eventStream columns: key (string), ts (timestamp). Emits one row
   * per finalized session: (key, session_start, session_end,
   * expires_at, n_events) with epoch-second bounds. Append-mode
   * compatible: a session only emits once the watermark guarantees no
   * event can extend it.
   */
  def sessionizeStream(events: DataFrame, gap: String = "5 minutes",
      allowedLateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", allowedLateness)
      .groupBy(col("key"), session_window(col("ts"), gap).as("_w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("key"),
        unix_timestamp(col("_w.start")).as("session_start"),
        unix_timestamp(col("_w.end") - expr(s"INTERVAL $gap")).as("session_end"),
        unix_timestamp(col("_w.end")).as("expires_at"),
        col("n_events"))
}
