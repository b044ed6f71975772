package graft.streaming

import graft.SparkTestBase
import graft.query.Downtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingReliabilitySpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 1609500000L

  // (machine, es, status) event log shared by both faces
  private val events: Seq[(String, Long, String)] = Seq(
    ("A", t0, "UP"), ("A", t0 + 100, "DOWN"), ("A", t0 + 160, "UP"),
    ("A", t0 + 160, "IDLE"), // 0-duration tie transition
    ("A", t0 + 400, "DOWN"), ("A", t0 + 500, "UP"),
    ("B", t0, "DOWN"), ("B", t0 + 50, "DOWN"), // equal value extends nothing
    ("B", t0 + 300, "UP"),
    ("C", t0, "UP"), ("C", t0 + 600, "UP")) // no failure → NULL KPIs... no closed DOWN

  private def batchKpis(prefix: Seq[(String, Long, String)]): Set[(String, Long, Option[Double], Option[Double])] = {
    val series = prefix.toDF("id", "es", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"), timestamp_seconds(col("es")).as("timestamp"))
    Downtime.reliability(Downtime.durations(series))
      .select("machineId", "n_down", "mttr_seconds", "mtbf_seconds")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSet
  }

  private def runStream(batches: Seq[Seq[(String, Long, String)]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val query = StreamingReliability.kpiStream(
        input.toDF().toDF("machineId", "epochSeconds", "value"))
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    // update mode: the freshest (max as_of) row per machine is current
    spark.table(name)
      .select("machineId", "n_down", "mttr_seconds", "mtbf_seconds", "as_of")
      .as[(String, Long, Option[Double], Option[Double], Long)].collect()
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._5) }
      .map(r => (r._1, r._2, r._3, r._4)).toSet
  }

  test("streamed KPIs equal the batch reliability on the same prefix (split invariance)") {
    // the stream also reports machines with no closed segment yet
    // (C: n_down 0, NULL KPIs) — the batch path has no row for them
    val expected = batchKpis(events) + (("C", 0L, None, None))
    // two very different batch partitionings of the same ordered log
    val bySize = events.grouped(4).toSeq
    val byTime = Seq(events.filter(_._2 < t0 + 200), events.filter(e => e._2 >= t0 + 200))
    assert(runStream(bySize, "rel_a") === expected)
    assert(runStream(byTime, "rel_b") === expected)
  }

  test("pure fold: change-point semantics, tie transitions, stale drop") {
    import StreamingReliability._
    // equal-value runs extend nothing; first observation opens
    val st = new TestGroupState[RelState]
    val out = foldReliability("A", Iterator(
      StatusObs("A", t0, "UP"), StatusObs("A", t0 + 100, "DOWN"),
      StatusObs("A", t0 + 160, "UP")), st).toSeq
    assert(out === Seq(RelKpi("A", 1L, Some(60.0), Some(100.0), 60.0, 100.0, t0 + 160)))
    // a second batch with a STALE message (before the open segment) drops it
    val out2 = foldReliability("A", Iterator(
      StatusObs("A", t0 + 10, "DOWN"), // stale: open since t0+160
      StatusObs("A", t0 + 260, "DOWN")), st).toSeq
    assert(out2 === Seq(RelKpi("A", 1L, Some(60.0), Some(200.0), 60.0, 200.0, t0 + 260)))
  }
}

/** Minimal in-memory GroupState for pure-fold unit tests. */
final class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = None
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newState: S): Unit = { v = Some(newState) }
  override def remove(): Unit = { v = None }
  private var timedOut: Boolean = false
  def setTimedOut(b: Boolean): Unit = { timedOut = b }
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
