package graft.streaming

import graft.SparkTestBase
import graft.query.{Downtime, Kpi}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAvailabilitySpec extends SparkTestBase {
  import spark.implicits._

  // the KpiSpec midnight-straddling fixture plus a second machine on
  // another line, an equal-value run, and a machine with SUB-SECOND
  // readings whose (ts_us, value) order disagrees with a
  // second-truncated (es, value) sort — the case that pins the fold
  // to the batch windows' exact microsecond key
  private val events: Seq[(String, Long, String)] = Seq(
    ("s0/a0/line0/m1", 0L, "UP"), ("s0/a0/line0/m1", 86300000000L, "DOWN"),
    ("s0/a0/line0/m1", 86600000000L, "UP"),
    ("s0/a0/line1/m2", 100000000L, "DOWN"), ("s0/a0/line1/m2", 200000000L, "DOWN"),
    ("s0/a0/line1/m2", 400000000L, "UP"), ("s0/a0/line1/m2", 700000000L, "IDLE"),
    // m4: UP at 10.1s then DOWN at 10.2s — an (es, value) sort would
    // fold DOWN first; the micro key keeps UP first like the batch
    ("s0/a0/line1/m4", 10100000L, "UP"), ("s0/a0/line1/m4", 10200000L, "DOWN"),
    ("s0/a0/line1/m4", 90000000L, "UP"))

  private def batchTrend(prefix: Seq[(String, Long, String)]) = {
    val series = prefix.toDF("id", "ts_us", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"),
        timestamp_micros(col("ts_us")).as("timestamp"))
    Kpi.availabilityTrend(Downtime.durations(series))
      .as[(String, Long, Long, Long, Double)].collect().toSet
  }

  private def runStream(batches: Seq[Seq[(String, Long, String)]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val query = StreamingAvailability.factStream(
        input.toDF().toDF("machineId", "tsUs", "value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name)
  }

  test("trend off the streamed facts equals the batch trend on the same prefix") {
    val expected = batchTrend(events)
    val facts = runStream(events.grouped(3).toSeq, "av_a")
    val streamed = StreamingAvailability.trend(facts)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty)
    // replayed facts collapse: duplicating the whole fact table
    // changes nothing observable
    val replayed = StreamingAvailability.trend(facts.unionByName(facts))
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(replayed === expected)
  }

  test("pure fold: only closures emit; straddling segments split exactly") {
    import StreamingAvailability._
    val st = new TestGroupState[AvailState]
    // open UP at 86300s-before-midnight; no emission yet
    assert(foldAvailability("m", Iterator(
      StatusObs("m", 0L, "UP"), StatusObs("m", 50000000L, "UP")), st).isEmpty)
    // closure at 86600s splits [0, 86600) into day0 86400 + day1 200
    val out = foldAvailability("m",
      Iterator(StatusObs("m", 86600000000L, "DOWN")), st).toSeq
    assert(out === Seq(
      DayFact("m", 0L, "UP", 86400L, 0L), DayFact("m", 1L, "UP", 200L, 0L)))
    assert(st.get === AvailState("DOWN", 86600000000L, 86600000000L))
  }
}
