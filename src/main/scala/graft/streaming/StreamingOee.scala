package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the OEE triple (`Kpi.oee`, oracle `x10_oee`):
 * maintain each machine's OEE ACCOUNTING incrementally — closed-
 * segment DOWN/total seconds (change-point semantics), rollover-
 * banked production, GOOD/total counts — instead of re-running the
 * events-scale windows per dashboard refresh.
 *
 * State per machine is O(1) (open segment + six counters); each batch
 * folds only its own messages. At every batch boundary the emitted
 * per-machine rows equal `Kpi.oeeMachineAccounting` over the event
 * prefix (the parity the spec pins), so the line-level OEE read off
 * the upserted store via [[lineOee]] — which delegates to
 * `Kpi.oeeFromAccounting`, the SAME rollup the batch path uses — is
 * bit-identical to the batch `Kpi.oee`.
 *
 * Tie handling mirrors the batch windows exactly: within a batch the
 * status fold orders by (ts, status) and the production fold by
 * (ts, cnt) — the two deterministic orderings the batch query uses.
 * Stale messages are dropped by BOTH folds, each against its own
 * horizon (the status fold's `lastEs`; the production fold's last
 * accepted (ts, cnt) key) — so parity holds over the in-order
 * subsequence each fold accepts, and out-of-order arrival can never
 * masquerade as a counter rollover.
 */
object StreamingOee {

  final case class OeeObs(machineId: String, epochSeconds: Long,
      status: String, cnt: Long, quality: String)

  /** Open status segment + accumulated accounting for one machine.
   * `(prodEs, lastCnt)` is the production fold's horizon — the last
   * (epochSeconds, cnt) key it accepted, mirroring the status fold's
   * `lastEs` — so a late message in a later batch can't be mistaken
   * for a counter rollover (see [[foldOee]]). */
  final case class OeeState(
      openStatus: String, openSince: Long, lastEs: Long,
      downSeconds: Double, totalSeconds: Double,
      banked: Long, lastCnt: Long, prodEs: Long, hasCnt: Boolean,
      nGood: Long, n: Long, lastSeen: Long)

  /** Per-machine accounting upsert (columns match
   * `Kpi.oeeMachineAccounting`); `as_of` orders successive upserts. */
  final case class OeeMachine(machineId: String, _down: Double, _tot: Double,
      _prod: Long, _good: Long, _n: Long, as_of: Long)

  private val DownValue = "DOWN"

  /** Fold one machine's batch. Pure — unit-testable without a stream. */
  def foldOee(machineId: String, msgs: Iterator[OeeObs],
      state: GroupState[OeeState]): Iterator[OeeMachine] = {
    val batch = msgs.toSeq
    if (batch.isEmpty) Iterator.empty
    else {
      var st = state.getOption.getOrElse(OeeState(
        null, Long.MinValue, Long.MinValue,
        0.0, 0.0, 0L, 0L, Long.MinValue, hasCnt = false, 0L, 0L, Long.MinValue))

      // status/segment fold — batch tie order (ts, status). The row-gap
      // identity: the gap from each observation to the next belongs to
      // the CURRENT observation's status; gaps at/after the last change
      // point stay in the open segment (not yet accounted).
      // cross-batch staleness is (ts, status)-keyed, mirroring the
      // production fold's (ts, cnt) horizon and the Streaming
      // Transitions/Availability folds: openStatus is always the
      // status of the LAST ACCEPTED message, so a same-second arrival
      // in a later batch with a smaller status sorts BEFORE it in the
      // batch (ts, status) order — accepting it in arrival order would
      // fold a 0-length segment flip the batch recompute never sees.
      batch.sortBy(m => (m.epochSeconds, m.status)).foreach { m =>
        if (st.openStatus == null) {
          st = st.copy(openStatus = m.status, openSince = m.epochSeconds,
            lastEs = m.epochSeconds)
        } else if (m.epochSeconds > st.lastEs ||
            (m.epochSeconds == st.lastEs && m.status >= st.openStatus)) {
          if (m.status != st.openStatus) {
            // closing the open segment: everything from openSince to m
            // becomes closed time under the open status
            val dur = (m.epochSeconds - st.openSince).toDouble
            st = st.copy(
              downSeconds = st.downSeconds + (if (st.openStatus == DownValue) dur else 0.0),
              totalSeconds = st.totalSeconds + dur,
              openStatus = m.status, openSince = m.epochSeconds,
              lastEs = m.epochSeconds)
          } else {
            st = st.copy(lastEs = m.epochSeconds)
          }
        } // stale: drop
        if (m.epochSeconds > st.lastSeen) st = st.copy(lastSeen = m.epochSeconds)
      }

      // production fold — batch tie order (ts, cnt); rollover banks the
      // previous counter value. Cross-batch stale messages (before the
      // fold's last accepted (ts, cnt) key) are DROPPED, like the
      // status fold and StreamingRateAnomaly.foldRate — a late reading
      // with an older ts and lower cnt is out-of-order arrival, not a
      // counter rollover; banking it would permanently inflate _prod.
      batch.sortBy(m => (m.epochSeconds, m.cnt)).foreach { m =>
        val stale = st.hasCnt &&
          (m.epochSeconds < st.prodEs ||
            (m.epochSeconds == st.prodEs && m.cnt < st.lastCnt))
        if (!stale) {
          if (!st.hasCnt) st = st.copy(lastCnt = m.cnt, prodEs = m.epochSeconds, hasCnt = true)
          else if (m.cnt < st.lastCnt)
            st = st.copy(banked = st.banked + st.lastCnt, lastCnt = m.cnt, prodEs = m.epochSeconds)
          else st = st.copy(lastCnt = m.cnt, prodEs = m.epochSeconds)
          if (m.quality == "GOOD") st = st.copy(nGood = st.nGood + 1)
          st = st.copy(n = st.n + 1)
        }
      }

      state.update(st)
      Iterator.single(OeeMachine(machineId,
        st.downSeconds, st.totalSeconds,
        st.banked + st.lastCnt, st.nGood, st.n, st.lastSeen))
    }
  }

  /**
   * Attach to a telemetry stream (columns machineId, es, status, cnt,
   * quality) → per-batch per-machine accounting upserts (update mode;
   * sinks upsert by machineId, latest `as_of` wins).
   */
  def accountingStream(telemetry: DataFrame): Dataset[OeeMachine] = {
    val spark = telemetry.sparkSession
    import spark.implicits._
    telemetry
      .selectExpr("machineId", "es AS epochSeconds", "status", "cnt", "quality")
      .as[OeeObs]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldOee)
  }

  /** Line-level OEE read off the upserted per-machine store — the
   * SAME rollup as the batch `Kpi.oee` (delegates to
   * `Kpi.oeeFromAccounting`), so streamed line OEE == batch OEE at
   * every batch boundary. */
  def lineOee(machineStore: DataFrame): DataFrame =
    graft.query.Kpi.oeeFromAccounting(
      machineStore.select(col("machineId"),
        col("_down"), col("_tot"), col("_prod"), col("_good"), col("_n")))
}
