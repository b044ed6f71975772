package graft.streaming

import graft.SparkTestBase
import graft.query.Kpi
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingTransitionsSpec extends SparkTestBase {
  import spark.implicits._

  // microsecond event times; m3 has an exact-tie flap (value
  // tie-break) and m4 a SUB-SECOND pair whose micro order disagrees
  // with a second-truncated sort — the batch-parity case that needs
  // the (ts_us, value) fold key
  private val events: Seq[(String, Long, String)] = Seq(
    ("s0/a0/line0/m1", 0L, "UP"), ("s0/a0/line0/m1", 10000000L, "DOWN"),
    ("s0/a0/line0/m1", 20000000L, "UP"), ("s0/a0/line0/m1", 30000000L, "UP"),
    ("s0/a0/line0/m1", 40000000L, "IDLE"),
    ("s0/a0/line0/m2", 0L, "UP"), ("s0/a0/line0/m2", 10000000L, "DOWN"),
    ("s0/a0/line1/m3", 5000000L, "DOWN"), ("s0/a0/line1/m3", 5000000L, "UP"),
    ("s0/a0/line1/m4", 5100000L, "UP"), ("s0/a0/line1/m4", 5200000L, "DOWN"))

  private def batchMatrix(prefix: Seq[(String, Long, String)]) =
    Kpi.transitionMatrix(prefix.toDF("machineId", "ts_us", "status"))
      .as[(String, String, String, Long)].collect().toSet

  test("matrix off the streamed facts equals the batch matrix; replays collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val query = StreamingTransitions.factStream(
        input.toDF().toDF("machineId", "tsUs", "value"))
      .writeStream.format("memory").queryName("tr_a").outputMode("append").start()
    events.grouped(3).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    val facts = spark.table("tr_a")
    val streamed = StreamingTransitions.matrix(facts)
      .as[(String, String, String, Long)].collect().toSet
    assert(streamed === batchMatrix(events))
    assert(streamed.nonEmpty)
    assert(StreamingTransitions.matrix(facts.unionByName(facts))
      .as[(String, String, String, Long)].collect().toSet === streamed)
  }

  test("pure fold: equal-value runs silent, same-second flap collapses like the batch sort") {
    import StreamingTransitions._
    val st = new TestGroupState[TransState]
    val out = foldTransitions("m", Iterator(
      StatusObs("m", 5L, "DOWN"), StatusObs("m", 5L, "UP"),
      StatusObs("m", 9L, "UP")), st).toSeq
    // sorted (5,DOWN),(5,UP),(9,UP): one DOWN->UP transition at 5
    assert(out === Seq(TransitionFact("m", "DOWN", "UP", 5L)))
    assert(st.get === TransState("UP", 9L))
    // sub-second pair: micro order (5.1 UP, 5.2 DOWN) must fold
    // UP-first — a second-truncated sort would flip it to DOWN->UP
    val st2 = new TestGroupState[TransState]
    val out2 = foldTransitions("m", Iterator(
      StatusObs("m", 5200000L, "DOWN"), StatusObs("m", 5100000L, "UP")), st2).toSeq
    assert(out2 === Seq(TransitionFact("m", "UP", "DOWN", 5200000L)))
  }
}
