package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: consecutive events of the same key belong
 * to one session while the inter-event gap stays ≤ `gap`; a larger gap
 * starts a new session. The classic telemetry/clickstream operator the
 * reference's dashboards approximate client-side with their 12 h
 * lookback windows (web-ui/src/views/machines/MachineDetail.tsx:31-32)
 * but never compute server-side.
 *
 * One shuffle on the key: the lag-gap flag and the running sum that
 * numbers sessions share the same window, and the final per-session
 * aggregation groups on (key, session_seq) — a prefix of the window
 * partitioning, so no second shuffle materializes.
 *
 * Session identity depends only on the sorted multiset of timestamps
 * per key (ties have gap 0 and can never open a session), so the
 * result is deterministic even when the tie-break order between
 * equal timestamps is arbitrary.
 */
object Sessions {

  /**
   * Sessionize by `keyCol` over integral epoch column `tsCol`,
   * breaking ties on `tieCol`. Output: (key, session_seq,
   * session_start, session_end, n_events) — `session_seq` is the
   * 1-based session index per key in time order, `session_start`/`_end`
   * the min/max event time inside the session.
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("_brk",
        when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
