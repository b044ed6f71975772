package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

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
}
