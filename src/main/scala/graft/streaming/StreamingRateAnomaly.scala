package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the production-rate anomaly detector
 * (`Kpi.rateAnomaly`, oracle `x13_rate_anomaly`): flag counter
 * increments whose z-score against the machine's trailing increments
 * crosses the threshold, AS the readings arrive — the live alerting
 * path of the monitoring deployment, vs the batch dashboard query.
 *
 * State per machine is the trailing ring of the last `windowRows`
 * accepted increments plus the last counter — O(windowRows) longs, so
 * fleet state is bounded by fleet × window regardless of stream
 * length. Each batch folds only its own messages.
 *
 * Parity contract (pinned by the spec): on in-order input the emitted
 * anomalies at every batch boundary equal `Kpi.rateAnomaly` over the
 * event prefix — same (ts, cnt) ordering, same rollover-reset
 * exclusion (negative deltas are dropped and never enter the ring),
 * same exact-integer trailing sums and single-IEEE z tree, same
 * compare-on-the-ROUNDED-score thresholding. Stale messages (before
 * the last folded (ts, cnt) key) are dropped like
 * [[StreamingReliability.foldReliability]].
 */
object StreamingRateAnomaly {

  final case class RateObs(machineId: String, tsUs: Long, eventId: Long, cnt: Long)

  /** Trailing ring (oldest-first) + last counter/order key. */
  final case class RateState(deltas: Seq[Long], lastCnt: Long, lastTsUs: Long,
      hasLast: Boolean)

  final case class RateAnomaly(machineId: String, event_id: Long, delta: Long,
      n_window: Long, z_score: Double)

  /** Fold one machine's batch; pure, unit-testable. Emits one row per
   * flagged increment (append semantics — an anomaly is a fact). */
  def foldRate(windowRows: Int, minObs: Int, zThreshold: Double)(
      machineId: String, msgs: Iterator[RateObs],
      state: GroupState[RateState]): Iterator[RateAnomaly] = {
    val sorted = msgs.toSeq.sortBy(m => (m.tsUs, m.cnt))
    var st = state.getOption.getOrElse(RateState(Vector.empty, 0L, Long.MinValue, hasLast = false))
    val out = Seq.newBuilder[RateAnomaly]
    sorted.foreach { m =>
      val stale = st.hasLast &&
        (m.tsUs < st.lastTsUs || (m.tsUs == st.lastTsUs && m.cnt < st.lastCnt))
      if (!stale) {
        if (st.hasLast) {
          val delta = m.cnt - st.lastCnt
          if (delta >= 0L) {
            // identical arithmetic tree to Kpi.rateAnomaly: exact
            // integer sums in double, one IEEE division/sqrt chain
            val n = st.deltas.size.toDouble
            if (st.deltas.size >= minObs) {
              var s1 = 0.0; var s2 = 0.0
              st.deltas.foreach { d => s1 += d.toDouble; s2 += d.toDouble * d.toDouble }
              val varNum = s2 - s1 * s1 / n
              if (varNum > 0.0) {
                val z = BigDecimal((delta.toDouble - s1 / n) / math.sqrt(varNum / (n - 1.0)))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(z) >= zThreshold)
                  out += RateAnomaly(machineId, m.eventId, delta, st.deltas.size.toLong, z)
              }
            }
            val ring = (st.deltas :+ delta).takeRight(windowRows)
            st = st.copy(deltas = ring)
          } // negative delta = rollover reset: excluded from the ring
        }
        st = st.copy(lastCnt = m.cnt, lastTsUs = m.tsUs, hasLast = true)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /**
   * Attach to a readings stream (columns machineId, tsUs, eventId,
   * cnt) → append-mode anomaly rows.
   */
  def anomalyStream(readings: DataFrame, windowRows: Int = 64, minObs: Int = 16,
      zThreshold: Double = 3.0): Dataset[RateAnomaly] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .selectExpr("machineId", "tsUs", "eventId", "cnt")
      .as[RateObs]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        foldRate(windowRows, minObs, zThreshold))
  }
}
