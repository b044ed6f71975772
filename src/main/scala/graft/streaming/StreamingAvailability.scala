package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the daily availability trend
 * (`Kpi.availabilityTrend`, oracle `x14_availability_trend`), designed
 * so per-machine state stays O(1) even though the trend is keyed by
 * DAY: the fold never accumulates per-day maps — when a status
 * segment CLOSES (change point arrives), it emits the segment's exact
 * per-day overlap seconds as APPEND-mode facts, and the trend is a
 * read-time rollup of the fact store through the same line×day
 * aggregation the batch path uses. Facts are immutable (a closed
 * segment never changes), so replays collapse by (machineId, segment
 * start) idempotently; the open segment lives only in state, exactly
 * matching the batch semantics that exclude it.
 */
object StreamingAvailability {

  /** `tsUs` is the full-resolution event time — the fold orders by
   * (ts_us, value) exactly like the batch change-point windows, so
   * parity holds for sub-second readings too (not only when event
   * times happen to be second-aligned). */
  final case class StatusObs(machineId: String, tsUs: Long, value: String)

  /** Open segment only — O(1) per machine. Times in microseconds;
   * emission floors to seconds exactly like the batch
   * `unix_timestamp`-based segment derivation. */
  final case class AvailState(openStatus: String, openSinceUs: Long, lastTsUs: Long)

  /** One closed segment × day overlap fact. `seg_start` keys replay
   * collapse (a segment closes exactly once per (machine, start)). */
  final case class DayFact(machineId: String, day: Long, value: String,
      overlap_s: Long, seg_start: Long)

  private val DaySeconds = 86400L

  /** Split a closed segment [start, end) into per-day overlap facts. */
  def daySplit(machineId: String, value: String, start: Long, end: Long): Seq[DayFact] =
    if (end <= start) Seq.empty
    else (start / DaySeconds to (end - 1) / DaySeconds).map { day =>
      DayFact(machineId, day, value,
        math.min(end, (day + 1) * DaySeconds) - math.max(start, day * DaySeconds),
        start)
    }

  /** Fold one machine's batch; emits facts for segments that CLOSED.
   * Ordering and the stale horizon use the batch windows' exact
   * (ts_us, value) key; segment endpoints floor to seconds at
   * emission (the batch `unix_timestamp` granularity). */
  def foldAvailability(machineId: String, msgs: Iterator[StatusObs],
      state: GroupState[AvailState]): Iterator[DayFact] = {
    val sorted = msgs.toSeq.sortBy(m => (m.tsUs, m.value))
    var st = state.getOption.getOrElse(AvailState(null, Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[DayFact]
    sorted.foreach { m =>
      val stale = st.openStatus != null &&
        (m.tsUs < st.lastTsUs || (m.tsUs == st.lastTsUs && m.value < st.openStatus))
      if (st.openStatus == null) {
        st = AvailState(m.value, m.tsUs, m.tsUs)
      } else if (!stale) {
        if (m.value != st.openStatus) {
          out ++= daySplit(machineId, st.openStatus,
            Math.floorDiv(st.openSinceUs, 1000000L), Math.floorDiv(m.tsUs, 1000000L))
          st = AvailState(m.value, m.tsUs, m.tsUs)
        } else {
          st = st.copy(lastTsUs = m.tsUs)
        }
      } // stale: drop
    }
    state.update(st)
    out.result().iterator
  }

  /** Attach to a status stream (columns machineId, tsUs, value) →
   * append-mode per-day segment facts. */
  def factStream(statusStream: DataFrame): Dataset[DayFact] = {
    val spark = statusStream.sparkSession
    import spark.implicits._
    statusStream
      .selectExpr("machineId", "tsUs", "value")
      .as[StatusObs]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(foldAvailability)
  }

  /** Line×day availability read off the fact store — identical
   * derivation to `Kpi.availabilityTrend`'s final rollup (exact
   * integer sums, same rounding), with at-least-once replays
   * collapsed by the (machineId, seg_start, day) fact identity. */
  def trend(facts: DataFrame, downValue: String = "DOWN"): DataFrame =
    facts
      .dropDuplicates("machineId", "seg_start", "day")
      .groupBy(split_part(col("machineId"), lit("/"), lit(3)).as("lineId"), col("day"))
      .agg(
        sum(when(col("value") === downValue, col("overlap_s")).otherwise(0L)).as("down_seconds"),
        sum(col("overlap_s")).as("total_seconds"))
      .withColumn("availability",
        round(lit(1.0) - col("down_seconds").cast("double") / col("total_seconds").cast("double"), 6))
}
