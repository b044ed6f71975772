package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KinesisSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("option mapping mirrors the reference's event-source envelope") {
    val opts = KinesisSource.options(
      KinesisSource.Config(streamName = "machine-data", region = "us-east-1"))
    // reference defaults: TRIM_HORIZON + batch 100
    // (real-time-processing-construct.ts:48-52)
    assert(opts("kinesis.streamName") == "machine-data")
    assert(opts("kinesis.region") == "us-east-1")
    assert(opts("kinesis.startingPosition") == "TRIM_HORIZON")
    assert(opts("kinesis.maxFetchRecordsPerShard") == "100")
    assert(!opts.contains("kinesis.endpointUrl"))
  }

  test("optional endpoint/consumer appear only when set; bad position rejected") {
    val opts = KinesisSource.options(KinesisSource.Config(
      streamName = "s", region = "r", startingPosition = "LATEST",
      endpointUrl = Some("http://localhost:4566"), consumerName = Some("efo")))
    assert(opts("kinesis.endpointUrl") == "http://localhost:4566")
    assert(opts("kinesis.consumerName") == "efo")
    assert(opts("kinesis.startingPosition") == "LATEST")
    intercept[IllegalArgumentException] {
      KinesisSource.options(KinesisSource.Config("s", "r", startingPosition = "EARLIEST"))
    }
    intercept[IllegalArgumentException] {
      KinesisSource.options(KinesisSource.Config("", "r"))
    }
  }

  test("toEnvelope re-encodes record bytes to the base64 payload the pipeline decodes") {
    val json = """{"messages":[{"a":1}]}"""
    val records = Seq(
      (json.getBytes("UTF-8"), "stream", "pk-1", "seq-1",
        java.sql.Timestamp.valueOf("2021-03-05 18:16:10")))
      .toDF("data", "streamName", "partitionKey", "sequenceNumber",
        "approximateArrivalTimestamp")
    val env = KinesisSource.toEnvelope(records)
    assert(env.columns.toSeq ==
      Seq("payload", "partitionKey", "sequenceNumber", "arrivalTs"))
    // round-trip through the SAME decode the parser uses
    val decoded = env.select(unbase64(col("payload")).cast("string")).as[String].head()
    assert(decoded == json)
  }

  test("reader builds against the documented connector format (load fails only on classpath)") {
    val ex = intercept[Exception] {
      KinesisSource.reader(spark,
        KinesisSource.Config("machine-data", "us-east-1")).load()
    }
    // no connector jar in this sandbox: Spark's standard missing
    // data-source error proves the format name reached lookup
    assert(ex.getMessage.toLowerCase.contains("aws-kinesis") ||
      ex.getMessage.toLowerCase.contains("failed to find"))
  }

  test("runIngest consumes the connector-shaped envelope unchanged (seam e2e)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val goodTs = "2021-03-05 18:16:10.517000+00:00"
    val json =
      s"""{"messages":[{"name":"s/a/l/m1/status","quality":"GOOD","timestamp":"$goodTs","value":"d"}]}"""
    val machineConfigs = Seq(("s/a/l/m1", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    // connector record shape: raw bytes + kinesis metadata
    val input = MemoryStream[(Array[Byte], String, String, String, java.sql.Timestamp)]
    val envelopes = KinesisSource.toEnvelope(input.toDF().toDF(
      "data", "streamName", "partitionKey", "sequenceNumber",
      "approximateArrivalTimestamp"))
    val merges = scala.collection.mutable.ArrayBuffer[graft.streaming.IngestPipeline.StatusUpdate]()
    val query = graft.streaming.IngestPipeline.runIngest(
      envelopes, "payload",
      loadConfigs = () => (Seq(graft.model.MessageFormatConfig(id = "DEFAULT")), machineConfigs),
      appendFacts = _ => (),
      mergeStatuses = ds => merges.synchronized { merges ++= ds.collect() })
    input.addData((json.getBytes("UTF-8"), "machine-data", "pk", "seq-1",
      java.sql.Timestamp.valueOf("2021-03-05 18:16:10")))
    query.processAllAvailable()
    query.stop()
    assert(merges.toSeq ==
      Seq(graft.streaming.IngestPipeline.StatusUpdate("s/a/l/m1", "DOWN", 1614968170L)))
  }
}
