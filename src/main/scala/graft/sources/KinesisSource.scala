package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/**
 * Kinesis source seam (S1's live-stream half).
 *
 * The reference ingests via a Kinesis stream wired to a filter Lambda
 * with `startingPosition: TRIM_HORIZON, batchSize: 100`
 * (real-time-processing-construct.ts:48-52). In this engine the same
 * hot path is [[graft.streaming.IngestPipeline]], which consumes ANY
 * streaming DataFrame carrying a base64 `payload` column — the tests
 * drive it from MemoryStream/file sources. This object supplies the
 * production wiring: a builder for the public Amazon Kinesis Spark
 * connector (`spark-streaming-sql-kinesis-connector`, format
 * `"aws-kinesis"`) and the record→envelope projection, so pointing
 * the pipeline at a real stream is one call:
 *
 * {{{
 * val envelopes = KinesisSource.readKinesis(spark,
 *   KinesisSource.Config(streamName = "machine-data", region = "us-east-1"))
 * IngestPipeline.runIngest(envelopes, "payload", ...)
 * }}}
 *
 * The connector jar is NOT bundled here (no egress in this sandbox);
 * [[options]] and [[toEnvelope]] are pure and unit-tested, [[reader]]
 * fails at `.load()` time with Spark's standard missing-data-source
 * error if the connector isn't on the classpath.
 */
object KinesisSource {

  /**
   * Stream position + batching knobs, defaulted to the reference's
   * event-source mapping (TRIM_HORIZON, batch 100 — the Lambda batch
   * size maps to the per-shard fetch bound, the connector's closest
   * analogue of an event-source batch).
   *
   * @param startingPosition LATEST | TRIM_HORIZON | AT_TIMESTAMP
   *   (connector accepts the same names as the Kinesis API)
   * @param endpointUrl  override for non-default endpoints (e.g. a
   *   local Kinesis emulator); None → connector derives from region
   */
  final case class Config(
      streamName: String,
      region: String,
      startingPosition: String = "TRIM_HORIZON",
      maxFetchRecordsPerShard: Int = 100,
      endpointUrl: Option[String] = None,
      consumerName: Option[String] = None)

  /** Connector option map (the documented surface of
   * spark-streaming-sql-kinesis-connector). Keeping this a pure
   * function is the point of the seam: it is testable without the
   * connector and greppable by an operator wiring a real cluster. */
  def options(cfg: Config): Map[String, String] = {
    require(cfg.streamName.nonEmpty, "streamName required")
    require(cfg.region.nonEmpty, "region required")
    require(Set("LATEST", "TRIM_HORIZON", "AT_TIMESTAMP").contains(cfg.startingPosition),
      s"unsupported startingPosition ${cfg.startingPosition}")
    Map(
      "kinesis.streamName" -> cfg.streamName,
      "kinesis.region" -> cfg.region,
      "kinesis.startingPosition" -> cfg.startingPosition,
      "kinesis.maxFetchRecordsPerShard" -> cfg.maxFetchRecordsPerShard.toString) ++
      cfg.endpointUrl.map("kinesis.endpointUrl" -> _) ++
      cfg.consumerName.map("kinesis.consumerName" -> _)
  }

  /** `spark.readStream.format("aws-kinesis")` with [[options]] applied. */
  def reader(spark: SparkSession, cfg: Config): DataStreamReader =
    options(cfg).foldLeft(spark.readStream.format("aws-kinesis")) {
      case (r, (k, v)) => r.option(k, v)
    }

  /**
   * Connector record → ingest envelope. The connector emits
   * `(data: binary, streamName, partitionKey, sequenceNumber,
   * approximateArrivalTimestamp)`; the reference Lambda receives the
   * same record with `data` base64-encoded (kinesis event JSON), so
   * the envelope re-encodes to base64 — IngestPipeline/MessageParser
   * decode exactly once, identically for live and test input.
   */
  def toEnvelope(records: DataFrame): DataFrame =
    records.select(
      base64(col("data")).as("payload"),
      col("partitionKey"),
      col("sequenceNumber"),
      col("approximateArrivalTimestamp").as("arrivalTs"))

  /** One-call production wiring: stream → envelope DataFrame with the
   * base64 `payload` column IngestPipeline.runIngest consumes. */
  def readKinesis(spark: SparkSession, cfg: Config): DataFrame =
    toEnvelope(reader(spark, cfg).load())
}
