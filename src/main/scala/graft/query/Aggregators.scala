package graft.query

import graft.model.MachineStatus
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed Aggregators for the two order-sensitive reference semantics
 * (SURVEY §2.9) — optional single-pass forms of what
 * Rollups.totalProduction and MachineDetail.condenseAll express with
 * windows/aggregates. Both are exact; tests cross-check them against
 * the window formulations.
 */
object Aggregators {

  /** (epochSeconds, value) observation. */
  final case class Obs(ts: Long, value: String)

  /**
   * DOWN-dominant-last status per bucket (A3): DISTRIBUTIVE — the
   * buffer tracks (anyDown, argmax-(ts,value)) and merges
   * associatively, so it parallelizes with map-side partials exactly
   * like the built-in max/max_by pair it replaces.
   */
  object DownDominantLast extends Aggregator[Obs, (Boolean, Long, String), String] {
    def zero: (Boolean, Long, String) = (false, Long.MinValue, null)
    def reduce(b: (Boolean, Long, String), o: Obs): (Boolean, Long, String) = {
      val anyDown = b._1 || o.value == MachineStatus.Down
      if (b._3 == null || (o.ts, o.value).compare((b._2, b._3)) > 0) (anyDown, o.ts, o.value)
      else (anyDown, b._2, b._3)
    }
    def merge(a: (Boolean, Long, String), b: (Boolean, Long, String)): (Boolean, Long, String) = {
      val anyDown = a._1 || b._1
      if (a._3 == null) (anyDown, b._2, b._3)
      else if (b._3 == null) (anyDown, a._2, a._3)
      else if ((b._2, b._3).compare((a._2, a._3)) > 0) (anyDown, b._2, b._3)
      else (anyDown, a._2, a._3)
    }
    def finish(b: (Boolean, Long, String)): String =
      if (b._1) MachineStatus.Down
      else if (b._3 == null) MachineStatus.Unknown
      else b._3
    def bufferEncoder: Encoder[(Boolean, Long, String)] = Encoders.tuple(
      Encoders.scalaBoolean, Encoders.scalaLong, Encoders.STRING)
    def outputEncoder: Encoder[String] = Encoders.STRING

    private implicit class TupleOrd(val t: (Long, String)) {
      def compare(o: (Long, String)): Int = {
        val c = java.lang.Long.compare(t._1, o._1)
        if (c != 0) c else Ordering[String].compare(t._2, o._2)
      }
    }
  }

  /** (ts, count) production observation. */
  final case class CountObs(ts: Long, count: Long)

  /**
   * Rollover production total (A7): the reference fold is ORDER-
   * SENSITIVE, so the buffer keeps the per-key observations and the
   * fold runs once, sorted, in finish. Correct for any partitioning
   * (merge concatenates); memory is O(series length per machine) —
   * for unbounded series prefer the window formulation
   * (Rollups.totalProduction), which this must always agree with.
   */
  object RolloverTotal extends Aggregator[CountObs, List[(Long, Long)], Long] {
    def zero: List[(Long, Long)] = Nil
    def reduce(b: List[(Long, Long)], o: CountObs): List[(Long, Long)] = (o.ts, o.count) :: b
    def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] = a ++ b
    def finish(b: List[(Long, Long)]): Long = {
      val sorted = b.sortBy(identity) // (ts, count) — same tie-break as the window form
      sorted match {
        case Nil => 0L
        case (_, first) :: rest =>
          // seed from the FIRST observation, not 0: a series of
          // all-negative counters must not bank a phantom 0 run
          // (reference counters are non-negative, so this is latent
          // there; the window form already behaves this way)
          var total = 0L
          var max = first
          rest.foreach { case (_, v) =>
            if (v > max) max = v
            else if (max > v) { total += max; max = v }
          }
          total + max
      }
    }
    def bufferEncoder: Encoder[List[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
