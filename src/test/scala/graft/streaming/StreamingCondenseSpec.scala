package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class StreamingCondenseSpec extends SparkTestBase {
  import spark.implicits._

  private val end = 1609502400L // 2021-01-01 12:00:00
  private def ts(s: Long) = new Timestamp(s * 1000)

  test("streaming condensation matches the batch golden fixture semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val stream = input.toDF().toDF("machineId", "ts", "value")
    val query = StreamingCondense.condenseStatusStream(stream)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()

    // the 2-minute golden fixture's status series (machine-detail.spec.ts:205-277)
    val statuses = Seq("UP", "UP", "UP", "IDLE", "UP", "UP", "DOWN", "UP", "UP")
      .zipWithIndex.map { case (v, i) => ("m/1", ts(end - 90 + i * 10), v) }
    input.addData(statuses: _*)
    // advance the watermark far enough to finalize both chunks
    input.addData(("m/2", ts(end + 600), "UP"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("chunks")
      .as[(String, Long, String)].collect().filter(_._1 == "m/1").sortBy(_._2)
    assert(out.toSeq == Seq(
      ("m/1", end - 60, "IDLE"), // boundary row in the earlier chunk
      ("m/1", end, "DOWN"))) // DOWN sticky
  }

  test("late rows straddling the watermark: accepted ones update, expired ones drop — batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val stream = input.toDF().toDF("machineId", "ts", "value")
    val query = StreamingCondense.condenseStatusStream(stream)
      .writeStream.format("memory").queryName("late_chunks").outputMode("append").start()

    // chunk A = (end-120, end-60], chunk B = (end-60, end]
    // batch 1: A is all-UP, B has one UP
    input.addData(
      ("m/1", ts(end - 90), "UP"), ("m/1", ts(end - 70), "UP"),
      ("m/1", ts(end - 30), "UP"))
    query.processAllAvailable()
    // batch 2: heartbeat advances the watermark to end-30 — chunk A
    // (window end end-60) finalizes as UP
    input.addData(("m/2", ts(end + 90), "UP"))
    query.processAllAvailable()
    // batch 3: a late DOWN into the FINALIZED chunk A (event end-80 <
    // watermark ⇒ dropped — would have flipped A to DOWN), a late DOWN
    // into the still-open chunk B (event end-10 > watermark ⇒ accepted,
    // flips B), and a heartbeat that finalizes B
    input.addData(
      ("m/1", ts(end - 80), "DOWN"),
      ("m/1", ts(end - 10), "DOWN"),
      ("m/2", ts(end + 300), "UP"))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("late_chunks")
      .as[(String, Long, String)].collect().filter(_._1 == "m/1").sortBy(_._2)
    assert(streamed.toSeq == Seq(
      ("m/1", end - 60, "UP"), // expired late DOWN dropped
      ("m/1", end, "DOWN"))) // in-watermark late DOWN applied

    // parity: the streamed chunks equal the batch condensation over the
    // retention-filtered input (every row EXCEPT the watermark-expired
    // one) — the same recompute a TTL'd real-time store would serve
    val accepted = Seq(
      ("STATUS_m/1", end - 90, "UP"), ("STATUS_m/1", end - 70, "UP"),
      ("STATUS_m/1", end - 30, "UP"), ("STATUS_m/1", end - 10, "DOWN"))
      .toDF("id", "messageTimestamp", "value")
    val batch = graft.query.MachineDetail.condenseAll(accepted, end - 120, end)
      .filter(col("machineId") === "m/1")
      .select("machineId", "dataAsOfUTCUnixTimestamp", "statusValue")
      .as[(String, Long, String)].collect().sortBy(_._2)
      .filter(r => streamed.map(_._2).contains(r._2))
    assert(batch.toSeq == streamed.toSeq)
  }
}
