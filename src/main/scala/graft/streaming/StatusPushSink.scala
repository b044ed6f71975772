package graft.streaming

import graft.streaming.IngestPipeline.{StatusMsg, StatusUpdate}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Status-transition push sink — the engine-side analogue of the
 * reference's dashboard fan-out: the filter Lambda writes each changed
 * machine status back through an AppSync mutation
 * (filter-kinesis-stream/index.ts:188-190, `doMutateAction(
 * updateUIReferenceItem, ...)`), and dashboards receive it live via
 * the GraphQL subscription `onUpdateUIReferenceItem`
 * (appsync-api/schema.graphql:25-27). This sink closes the same loop
 * over [[IngestPipeline.changedStatuses]]: only TRANSITIONS are
 * pushed (the change suppression lives upstream in the stateful
 * fold), each exactly once per micro-batch even under at-least-once
 * replay.
 *
 * Structure mirrors [[graft.sources.KinesisSource]]: a pure, testable
 * options-builder for the external endpoint ([[options]]), a
 * transport seam ([[Publisher]]) the tests satisfy in memory, and a
 * `writeStream` attach point ([[attach]]). The real AppSync transport
 * is a plain HTTPS POST of [[mutationBody]] per event — deliberately
 * NOT bundled (no egress here); any HTTP client satisfies the seam in
 * one line.
 *
 * Replay idempotency: `foreachBatch` is at-least-once — a crash after
 * publish but before the checkpoint commit replays the SAME batch id
 * with the SAME deterministic events. Publishing keys on a batch-id
 * ledger (the [[graft.sources.EtlLedger]] discipline: commit AFTER
 * the side effect): a batch id at or below the committed watermark is
 * skipped wholesale, so subscribers see each transition once. The
 * ledger write is one tiny parquet append per batch — negligible next
 * to the push itself, and the watermark read is a driver-side scan of
 * a few-row table.
 *
 * Scale: transitions are change-suppressed upstream, so batch volume
 * is bounded by the machine fleet, not the message rate; events are
 * collected to the driver only AFTER that suppression (same bounded-
 * cardinality justification as UiReferenceStore.ensureMachines).
 */
object StatusPushSink {

  /** Endpoint config for the AppSync-shaped push target.
   * @param authMode API_KEY | AWS_IAM — the two modes the reference's
   *   AppSync API accepts; the key itself comes from the environment
   *   at transport-construction time, never from config. */
  final case class Config(
      endpoint: String,
      region: String,
      authMode: String = "API_KEY",
      mutation: String = "updateUIReferenceItem",
      maxEventsPerPost: Int = 25)

  /** Pure option map — the documented surface an operator wires into
   * a real HTTP transport. Testable without any client. */
  def options(cfg: Config): Map[String, String] = {
    require(cfg.endpoint.nonEmpty, "endpoint required")
    require(cfg.region.nonEmpty, "region required")
    require(Set("API_KEY", "AWS_IAM").contains(cfg.authMode),
      s"unsupported authMode ${cfg.authMode}")
    require(cfg.maxEventsPerPost > 0, "maxEventsPerPost must be positive")
    Map(
      "push.endpoint" -> cfg.endpoint,
      "push.region" -> cfg.region,
      "push.authMode" -> cfg.authMode,
      "push.mutation" -> cfg.mutation,
      "push.maxEventsPerPost" -> cfg.maxEventsPerPost.toString)
  }

  /** GraphQL mutation body for one transition — the engine-side twin
   * of the Lambda's update-mutation input (index.ts:193+: id, type,
   * machineStatus, machineStatusUpdatedTimestamp). */
  def mutationBody(cfg: Config, e: StatusUpdate): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    s"""{"query":"mutation { ${cfg.mutation}(input: $$input) { id machineStatus } }","variables":{"input":{"id":${q(e.machineId)},"machineStatus":${q(e.machineStatus)},"machineStatusUpdatedTimestamp":${e.machineStatusUpdatedTimestamp}}}}"""
  }

  /** Transport seam: receives one micro-batch's transitions (already
   * change-suppressed, already replay-deduped). Implementations post
   * [[mutationBody]] per event in [[Config.maxEventsPerPost]] chunks. */
  trait Publisher {
    def publish(events: Seq[StatusUpdate]): Unit
  }

  /** In-memory publisher for tests and local runs: appends to a
   * thread-safe buffer. */
  final class MemoryPublisher extends Publisher {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[StatusUpdate]()
    def publish(events: Seq[StatusUpdate]): Unit = events.foreach(buf.add)
    def published: Seq[StatusUpdate] = {
      val it = buf.iterator(); val b = Seq.newBuilder[StatusUpdate]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private def ledgerFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest batch id already published (−1 when none). */
  def committedWatermark(spark: SparkSession, ledgerPath: String): Long = {
    val (f, p) = ledgerFs(spark, ledgerPath)
    if (!f.exists(p)) -1L
    else {
      val df = spark.read.parquet(ledgerPath)
      if (df.isEmpty) -1L
      else df.agg(org.apache.spark.sql.functions.max("batch_id"))
        .head().getLong(0)
    }
  }

  /** One micro-batch: publish transitions unless `batchId` is at or
   * below the committed watermark, then commit. Events sort
   * (machineId) so a publisher's view is deterministic. Exposed for
   * direct testing, as [[IngestPipeline.parseBatch]] is. */
  def processBatch(events: Dataset[StatusUpdate], batchId: Long,
      publisher: Publisher, ledgerPath: String): Unit = {
    val spark = events.sparkSession
    import spark.implicits._
    if (batchId <= committedWatermark(spark, ledgerPath)) return // replay: already pushed
    val batch = events.collect().sortBy(_.machineId).toSeq // bounded by fleet size
    if (batch.nonEmpty) publisher.publish(batch)
    Seq(batchId).toDF("batch_id")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(ledgerPath)
  }

  /** Attach the push sink to a raw status-message stream: stateful
   * change suppression ([[IngestPipeline.changedStatuses]]) feeding
   * exactly-once publication. `initialState` hydrates machine→status
   * on cold start so a restart doesn't re-announce standing statuses. */
  def attach(statusMsgs: Dataset[StatusMsg], publisher: Publisher,
      ledgerPath: String, checkpoint: String,
      initialState: Option[Dataset[(String, String)]] = None): StreamingQuery =
    IngestPipeline.changedStatuses(statusMsgs, initialState)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[StatusUpdate], batchId: Long) =>
        processBatch(batch, batchId, publisher, ledgerPath)
      }
      .start()
}
