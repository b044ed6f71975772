package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 1609500000L
  private def ts(s: Long) = new Timestamp(s * 1000)

  test("sessions merge across micro-batches and finalize on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val stream = input.toDF().toDF("key", "ts")
    val query = StreamingSessions.sessionizeStream(stream, gap = "5 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()

    // batch 1: two events 2 min apart — one open session
    input.addData(("m1", ts(t0)), ("m1", ts(t0 + 120)))
    // batch 2: extends the SAME session (gap 3 min < 5), plus another key
    input.addData(("m1", ts(t0 + 300)), ("m2", ts(t0 + 100)))
    // batch 3: far-future event pushes the watermark past both sessions
    input.addData(("m3", ts(t0 + 7200)))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("sessions")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val m1 = out.filter(_._1 == "m1")
    val m2 = out.filter(_._1 == "m2")
    // cross-batch merge: ONE m1 session spanning all three events
    assert(m1.toSeq == Seq(("m1", t0, t0 + 300, t0 + 300 + 300, 3L)))
    assert(m2.toSeq == Seq(("m2", t0 + 100, t0 + 100, t0 + 100 + 300, 1L)))
  }

  test("streaming sessions agree with the batch operator on (start, count)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ("m1", t0), ("m1", t0 + 200), ("m1", t0 + 1000), // gap 800 > 300 → 2 sessions
      ("m2", t0 + 50))
    val input = MemoryStream[(String, Timestamp)]
    val query = StreamingSessions
      .sessionizeStream(input.toDF().toDF("key", "ts"), gap = "300 seconds")
      .writeStream.format("memory").queryName("sessions2").outputMode("append").start()
    input.addData(events.map { case (k, s) => (k, ts(s)) }: _*)
    input.addData(("mX", ts(t0 + 7200))) // watermark push
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sessions2")
      .select($"key", $"session_start", $"session_end", $"n_events")
      .as[(String, Long, Long, Long)].collect().toSet
      .filter(_._1 != "mX")
    val batch = graft.query.Sessions.sessionize(
      events.toDF("key", "es").withColumn("tie", lit(1L)), "key", "es", "tie", gap = 300L)
      .select($"key", $"session_start", $"session_end", $"n_events")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
