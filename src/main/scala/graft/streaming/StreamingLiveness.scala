package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Machine-liveness staleness alerts — the streaming analogue of the
 * reference's DynamoDB-TTL rule (a machine whose series stops
 * reporting goes stale; P6 synthesizes the TTL attribute per record).
 * The batch face is `Kpi.gapReport` (x16) — after-the-fact audit;
 * this face raises the alert AT expiry, using Structured Streaming's
 * event-time timeouts instead of a poll loop:
 *
 *  - every reading advances the machine's `lastSeen` and re-arms an
 *    event-time timeout at `lastSeen + ttl`;
 *  - when the WATERMARK (not wall clock — replays and backfills stay
 *    deterministic) passes that point with no newer reading, the state
 *    times out and one STALE alert is emitted;
 *  - the machine's next reading emits a RECOVERED alert and re-arms.
 *
 * State is O(1) per machine (lastSeen + stale flag); alerts are
 * append-mode facts. Rows reaching the fold always sit at/after the
 * watermark (fMGWS drops late data), so an armed timeout is always in
 * the future; the immediate-stale fallback in the fold is a defensive
 * guard for state hydrated from an older run (arming a past timeout
 * is illegal).
 */
object StreamingLiveness {

  final case class Reading(machineId: String, ts: java.sql.Timestamp) {
    def epochSeconds: Long = ts.getTime / 1000L
  }

  final case class LiveState(lastSeen: Long, stale: Boolean)

  /** `kind` is STALE or RECOVERED; `as_of` the event-time second the
   * verdict is anchored to (expiry horizon for STALE, the reviving
   * reading for RECOVERED). */
  final case class LivenessAlert(machineId: String, kind: String,
      last_seen: Long, as_of: Long)

  def foldLiveness(ttlSeconds: Long)(machineId: String, msgs: Iterator[Reading],
      state: GroupState[LiveState]): Iterator[LivenessAlert] = {
    if (state.hasTimedOut) {
      val st = state.get
      // stays stale (no timeout armed) until a reading revives it
      state.update(st.copy(stale = true))
      Iterator.single(LivenessAlert(machineId, "STALE", st.lastSeen, st.lastSeen + ttlSeconds))
    } else {
      val maxSeen = msgs.map(_.epochSeconds).max
      val prev = state.getOption
      val lastSeen = prev.map(p => math.max(p.lastSeen, maxSeen)).getOrElse(maxSeen)
      val wasStale = prev.exists(_.stale)
      val expiryMs = (lastSeen + ttlSeconds) * 1000L
      if (expiryMs > state.getCurrentWatermarkMs()) {
        state.update(LiveState(lastSeen, stale = false))
        state.setTimeoutTimestamp(expiryMs)
        if (wasStale) Iterator.single(LivenessAlert(machineId, "RECOVERED", lastSeen, lastSeen))
        else Iterator.empty
      } else {
        // the freshest reading is ALREADY beyond the expiry horizon:
        // immediate stale verdict (arming a past timeout is illegal)
        state.update(LiveState(lastSeen, stale = true))
        if (wasStale) Iterator.empty
        else Iterator.single(LivenessAlert(machineId, "STALE", lastSeen, lastSeen + ttlSeconds))
      }
    }
  }

  /**
   * Attach to a readings stream (columns machineId, ts TimestampType)
   * → append-mode liveness alerts. `watermarkDelay` bounds how much
   * event-time disorder is tolerated before expiry verdicts fire.
   */
  def alertStream(readings: DataFrame, ttlSeconds: Long,
      watermarkDelay: String = "0 seconds"): Dataset[LivenessAlert] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .selectExpr("machineId", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[Reading]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        foldLiveness(ttlSeconds))
  }
}
