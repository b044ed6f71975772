package graft.streaming

import graft.SparkTestBase
import graft.streaming.IngestPipeline.{StatusMsg, StatusUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatusPushSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("options builder validates and maps the endpoint surface") {
    val cfg = StatusPushSink.Config("https://api.example/graphql", "us-east-1")
    val o = StatusPushSink.options(cfg)
    assert(o("push.endpoint") == "https://api.example/graphql")
    assert(o("push.mutation") == "updateUIReferenceItem")
    assert(o("push.authMode") == "API_KEY")
    intercept[IllegalArgumentException] {
      StatusPushSink.options(cfg.copy(authMode = "NONE"))
    }
    intercept[IllegalArgumentException] {
      StatusPushSink.options(cfg.copy(endpoint = ""))
    }
    // mutation body: valid JSON shape with escaped fields
    val body = StatusPushSink.mutationBody(cfg,
      StatusUpdate("m\"1", "DOWN", 1614968170L))
    assert(body.contains("\"machineStatus\":\"DOWN\""))
    assert(body.contains("\\\"")) // quote in id escaped
    assert(body.contains("\"machineStatusUpdatedTimestamp\":1614968170"))
  }

  test("e2e: MemoryStream in, only transition events pushed, replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("push-sink").toString
    val pub = new StatusPushSink.MemoryPublisher
    val input = MemoryStream[StatusMsg](spark)
    val q = StatusPushSink.attach(input.toDS(), pub,
      s"$dir/ledger", s"$dir/chk",
      initialState = Some(Seq(("m1", "UP")).toDS())) // m1 already UP
    try {
      // batch 1: m1 unchanged (suppressed), m2 first-seen DOWN (pushed)
      input.addData(StatusMsg("m1", "UP", 100L), StatusMsg("m2", "DOWN", 101L))
      q.processAllAvailable()
      // batch 2: m1 flips (pushed), m2 repeats DOWN (suppressed)
      input.addData(StatusMsg("m1", "DOWN", 200L), StatusMsg("m2", "DOWN", 201L))
      q.processAllAvailable()
      // batch 3: out-of-order within batch — last by timestamp wins,
      // m2 DOWN→UP pushed once with the transition value
      input.addData(StatusMsg("m2", "UP", 301L), StatusMsg("m2", "DOWN", 300L))
      q.processAllAvailable()
    } finally q.stop()

    assert(pub.published == Seq(
      StatusUpdate("m2", "DOWN", 101L),
      StatusUpdate("m1", "DOWN", 200L),
      StatusUpdate("m2", "UP", 301L)))

    // at-least-once replay: the same batch id re-fires (crash between
    // publish and checkpoint commit) — the ledger watermark suppresses
    // the duplicate push entirely
    val replay = Seq(StatusUpdate("m2", "UP", 301L)).toDS()
    StatusPushSink.processBatch(replay, batchId = 2L, pub, s"$dir/ledger")
    assert(pub.published.size == 3, "replayed batch must not re-publish")

    // a genuinely new batch id still goes through
    StatusPushSink.processBatch(
      Seq(StatusUpdate("m3", "UP", 400L)).toDS(), batchId = 3L, pub, s"$dir/ledger")
    assert(pub.published.size == 4)
    assert(StatusPushSink.committedWatermark(spark, s"$dir/ledger") == 3L)

    // empty transition batches commit the watermark without a publish
    StatusPushSink.processBatch(
      spark.emptyDataset[StatusUpdate], batchId = 4L, pub, s"$dir/ledger")
    assert(pub.published.size == 4)
    assert(StatusPushSink.committedWatermark(spark, s"$dir/ledger") == 4L)
  }
}
