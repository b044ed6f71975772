package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the status-transition matrix
 * (`Kpi.transitionMatrix`, oracle `x17_transition_matrix`): every
 * change point emits one immutable (from → to) transition fact,
 * append-mode, keyed by (machine, at, from, to) for replay collapse
 * (unique by construction — same-second flaps collapse in the
 * deterministic (ts, status) sort before folding); the matrix
 * is a read-time count rollup of the fact store — the same
 * change-point semantics as the batch lag/filter formulation (equal-
 * value runs emit nothing, the first observation opens without a
 * transition). State per machine is O(1): the last folded status.
 */
object StreamingTransitions {

  /** `tsUs` is the full-resolution event time — the fold orders by
   * (ts_us, value), the batch windows' exact key, so sub-second
   * readings tie-break identically to the batch sort. */
  final case class StatusObs(machineId: String, tsUs: Long, value: String)

  final case class TransState(lastStatus: String, lastTsUs: Long)

  /** One change-point fact; `at_us` is the full-resolution event time
   * the new status took effect — microseconds so replay identity
   * stays exact even for same-second flap sequences. */
  final case class TransitionFact(machineId: String, from_status: String,
      to_status: String, at_us: Long)

  def foldTransitions(machineId: String, msgs: Iterator[StatusObs],
      state: GroupState[TransState]): Iterator[TransitionFact] = {
    val sorted = msgs.toSeq.sortBy(m => (m.tsUs, m.value))
    var st = state.getOption.getOrElse(TransState(null, Long.MinValue))
    val out = Seq.newBuilder[TransitionFact]
    sorted.foreach { m =>
      val stale = st.lastStatus != null &&
        (m.tsUs < st.lastTsUs || (m.tsUs == st.lastTsUs && m.value < st.lastStatus))
      if (st.lastStatus == null) st = TransState(m.value, m.tsUs)
      else if (!stale) {
        if (m.value != st.lastStatus)
          out += TransitionFact(machineId, st.lastStatus, m.value, m.tsUs)
        st = TransState(m.value, m.tsUs)
      } // stale: drop
    }
    state.update(st)
    out.result().iterator
  }

  def factStream(statusStream: DataFrame): Dataset[TransitionFact] = {
    val spark = statusStream.sparkSession
    import spark.implicits._
    statusStream
      .selectExpr("machineId", "tsUs", "value")
      .as[StatusObs]
      .groupByKey(_.machineId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(foldTransitions)
  }

  /** Line-keyed matrix off the fact store (batch-identical rollup),
   * at-least-once replays collapsed by the (machine, at_us) identity. */
  def matrix(facts: DataFrame): DataFrame =
    facts
      .dropDuplicates("machineId", "at_us", "from_status", "to_status")
      .groupBy(
        split_part(col("machineId"), lit("/"), lit(3)).as("lineId"),
        col("from_status"), col("to_status"))
      .agg(count(lit(1)).as("n_transitions"))
}
