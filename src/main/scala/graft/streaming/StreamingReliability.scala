package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the reliability KPI family (`Downtime.durations` →
 * `Downtime.reliability`, oracle `x9_reliability`): maintain each
 * machine's closed-segment downtime accounting INCREMENTALLY as status
 * messages arrive, instead of recomputing the change-point windows
 * over the whole history per refresh.
 *
 * State per machine is O(1) — the open segment's (status, start) plus
 * four accumulated counters — so fleet state is bounded by fleet size,
 * like the reference's real-time table (one row per machine series,
 * appsync-api-construct.ts:51-59). Each batch folds only that batch's
 * messages; there is no per-batch scan of history.
 *
 * Semantics match the batch path exactly on in-order input: a segment
 * opens at a status CHANGE and closes at the next change (equal-value
 * observations extend nothing — change-point compression), durations
 * are epoch-second differences, and the trailing open segment is
 * excluded — so at every batch boundary the emitted KPIs equal
 * `Downtime.reliability(Downtime.durations(prefix))` on the event
 * prefix seen so far (the parity the spec pins). Within a batch,
 * messages sort by (ts, value) — the engine-wide deterministic
 * tie-break; messages older than the open segment's start (late
 * cross-batch stragglers) are dropped, mirroring the last-wins fold of
 * [[IngestPipeline.foldStatus]].
 */
object StreamingReliability {

  final case class StatusObs(machineId: String, epochSeconds: Long, value: String)

  /** Open segment + closed-segment accumulators for one machine.
   * `lastSeen` is the max event time folded so far — the row's
   * freshness stamp, monotone per machine. */
  final case class RelState(openStatus: String, openSince: Long,
      nDown: Long, downSeconds: Double, upSeconds: Double, lastSeen: Long)

  /** Running KPI row (same derivation as `Downtime.reliability`);
   * `as_of` orders successive upserts of the same machine. */
  final case class RelKpi(machineId: String, n_down: Long,
      mttr_seconds: Option[Double], mtbf_seconds: Option[Double],
      down_seconds: Double, up_seconds: Double, as_of: Long)

  private val DownValue = "DOWN"

  /** Fold one machine's batch of observations into updated accounting.
   * Pure — unit-testable without a stream. Emits one KPI row per
   * touched machine per batch (update-mode upsert by machineId). */
  def foldReliability(machineId: String, msgs: Iterator[StatusObs],
      state: GroupState[RelState]): Iterator[RelKpi] = {
    val sorted = msgs.toSeq.sortBy(m => (m.epochSeconds, m.value))
    if (sorted.isEmpty) Iterator.empty
    else {
      var st = state.getOption.getOrElse(RelState(null, Long.MinValue, 0L, 0.0, 0.0, Long.MinValue))
      sorted.foreach { m =>
        if (st.openStatus == null) {
          st = st.copy(openStatus = m.value, openSince = m.epochSeconds)
        } else if (m.epochSeconds >= st.openSince && m.value != st.openStatus) {
          val dur = (m.epochSeconds - st.openSince).toDouble
          st =
            if (st.openStatus == DownValue)
              st.copy(openStatus = m.value, openSince = m.epochSeconds,
                nDown = st.nDown + 1, downSeconds = st.downSeconds + dur)
            else
              st.copy(openStatus = m.value, openSince = m.epochSeconds,
                upSeconds = st.upSeconds + dur)
        } // equal value extends nothing; stale (pre-open) messages drop
        if (m.epochSeconds > st.lastSeen) st = st.copy(lastSeen = m.epochSeconds)
      }
      state.update(st)
      Iterator.single(RelKpi(machineId, st.nDown,
        if (st.nDown > 0) Some(st.downSeconds / st.nDown) else None,
        if (st.nDown > 0) Some(st.upSeconds / st.nDown) else None,
        st.downSeconds, st.upSeconds, st.lastSeen))
    }
  }

  /**
   * Attach to a status stream (columns machineId, epochSeconds, value)
   * → per-batch updated KPI rows. Update output mode: sinks upsert by
   * machineId (a replayed batch re-emits the machine's CURRENT row —
   * convergent, because state updates themselves are exactly-once
   * under checkpointing).
   */
  def kpiStream(statusStream: DataFrame): Dataset[RelKpi] = {
    val spark = statusStream.sparkSession
    import spark.implicits._
    statusStream
      .selectExpr("machineId", "epochSeconds", "value")
      .as[StatusObs]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldReliability)
  }
}
