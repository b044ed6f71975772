package graft.streaming

import graft.SparkTestBase
import graft.model.MessageFormatConfig
import graft.streaming.IngestPipeline.{StatusMsg, StatusUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Streaming-state parity tests (SURVEY §2.8): change-suppressed status
 * updates with cold-start hydration, and the full foreachBatch ingest
 * over a memory stream.
 */
class IngestPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("changedStatuses emits on change only, with batch-local last-wins fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusMsg]
    val query = IngestPipeline.changedStatuses(input.toDS())
      .writeStream.format("memory").queryName("updates").outputMode("append").start()

    // batch 1: m1 flaps UP→DOWN within the batch (last wins: DOWN); m2 UP
    input.addData(
      StatusMsg("m1", "UP", 100), StatusMsg("m1", "DOWN", 200), StatusMsg("m2", "UP", 150))
    query.processAllAvailable()
    // batch 2: m1 stays DOWN (suppressed), m2 changes to IDLE
    input.addData(StatusMsg("m1", "DOWN", 300), StatusMsg("m2", "IDLE", 310))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("updates").as[StatusUpdate].collect().toSet
    assert(rows == Set(
      StatusUpdate("m1", "DOWN", 200),
      StatusUpdate("m2", "UP", 150),
      StatusUpdate("m2", "IDLE", 310)))
  }

  test("cold-start hydration: initial state suppresses unchanged statuses") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusMsg]
    val init = Seq(("m1", "DOWN"), ("m2", "UP")).toDS()
    val query = IngestPipeline.changedStatuses(input.toDS(), Some(init))
      .writeStream.format("memory").queryName("hydrated").outputMode("append").start()

    input.addData(StatusMsg("m1", "DOWN", 100), StatusMsg("m2", "DOWN", 110))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("hydrated").as[StatusUpdate].collect().toSet
    assert(rows == Set(StatusUpdate("m2", "DOWN", 110))) // m1 unchanged vs hydrated state
  }

  test("end-to-end foreachBatch ingest: parse, classify, facts + status merge") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val goodTs = "2021-03-05 18:16:10.517000+00:00"
    def payload(tag: String, value: String): String = {
      val json = s"""{"messages":[{"name":"site/area/line/m1/$tag","quality":"GOOD","timestamp":"$goodTs","value":"$value"}]}"""
      java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
    }
    val machineConfigs = Seq(("site/area/line/m1", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")

    val input = MemoryStream[String]
    val facts = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val merges = scala.collection.mutable.ArrayBuffer[StatusUpdate]()
    val query = IngestPipeline.runIngest(
      input.toDF().withColumnRenamed("value", "payload"),
      "payload",
      loadConfigs = () => (Seq(MessageFormatConfig(id = "DEFAULT")), machineConfigs),
      appendFacts = df => facts.synchronized { facts ++= df.collect() },
      mergeStatuses = ds => merges.synchronized { merges ++= ds.collect() })

    input.addData(payload("status", "d"), payload("pc", "42"), payload("temperature", "99"))
    query.processAllAvailable()
    query.stop()

    // temperature message dropped (P5); status + pc become facts
    assert(facts.map(_.getString(0)).toSet ==
      Set("STATUS_site/area/line/m1", "PRODUCTION_COUNT_site/area/line/m1"))
    assert(merges.toSeq == Seq(StatusUpdate("site/area/line/m1", "DOWN", 1614968170L)))
  }

  test("TTL compaction retains only unexpired rows") {
    val rt = Seq(("STATUS_m", 100L, "UP", 1000L), ("STATUS_m", 200L, "DOWN", 2000L))
      .toDF("id", "messageTimestamp", "value", "expirationTimestamp")
    assert(IngestPipeline.compactExpired(rt, nowEpochS = 1500).count() == 1)
  }
}
