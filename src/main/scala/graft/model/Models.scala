package graft.model

/**
 * Core data model for the graft engine — the Spark-native re-expression of
 * the reference's data shapes (machine-downtime-monitor-on-aws).
 *
 * Citations into /root/reference:
 *  - Tag message IR: source/lambda/util/data-models.ts:4-12
 *  - Config items:   source/lambda/util/gql-schema-interfaces.ts:6-38
 *  - Real-time row:  source/lambda/filter-kinesis-stream/index.ts:315-326
 *  - UI reference:   source/lambda/util/data-models.ts:14-26
 */

/** MachineStatus enum — data-models.ts:28-33. */
object MachineStatus {
  val Up = "UP"
  val Down = "DOWN"
  val Idle = "IDLE"
  val Unknown = "UNKNOWN"
  val all: Seq[String] = Seq(Up, Down, Idle, Unknown)
}

/** Real-time series type prefix — data-models.ts:35-38. */
object MsgType {
  val Status = "STATUS"
  val ProductionCount = "PRODUCTION_COUNT"
}

/**
 * MESSAGE_FORMAT config item — gql-schema-interfaces.ts:11-19; default
 * seed solution-helper-construct.ts:141-149. Key names are DATA, not
 * schema: the parser builds its JSON schema from these at runtime.
 */
final case class MessageFormatConfig(
    id: String,
    messagesKey: String = "messages",
    aliasKey: String = "name",
    qualityKey: String = "quality",
    timestampKey: String = "timestamp",
    valueKey: String = "value",
    timestampFormat: String = "YYYY-MM-DD HH:mm:ss.SSSSSSZZ", // moment.js syntax
    aliasDelimiter: String = "/")

/**
 * MACHINE_CONFIG config item — gql-schema-interfaces.ts:26-32. The
 * up/down/idle values are comma-separated lists matched against the
 * STRINGIFIED message value (machine-data-parser.ts:86-97).
 */
final case class MachineConfig(
    machineId: String,
    statusTag: Option[String],
    productionCountTag: Option[String],
    statusUpValues: Option[String],
    statusDownValues: Option[String],
    statusIdleValues: Option[String])

/** UI_REFERENCE_MAPPING — solution-helper-construct.ts:150-153. */
final case class UiReferenceMapping(locationKeys: String = "0/1", lineKeys: String = "2")

/**
 * Parsed tag message — the engine IR (data-models.ts:4-12).
 * `epochSeconds` mirrors the reference's unix-seconds storage
 * (machine-data-parser.ts:61,78); `value` is always stringified
 * (index.ts:322).
 */
final case class TagMessage(
    machineId: String,
    tag: String,
    value: String,
    quality: String,
    epochSeconds: Long,
    isStatusMsg: Boolean,
    isProductionCountMsg: Boolean,
    machineStatus: Option[String])

/** Real-time fact row — appsync-api-construct.ts:51-59, index.ts:315-326. */
final case class RealTimeRow(
    id: String, // s"${msgType}_${machineId}"
    messageTimestamp: Long, // unix seconds
    value: String,
    expirationTimestamp: Long)

/** UI reference (latest state per machine) — data-models.ts:14-26. */
final case class UiReferenceRow(
    id: String,
    refType: String, // MACHINE | LOCATION | LINE
    name: Option[String],
    machineStatus: Option[String],
    machineStatusUpdatedTimestamp: Option[Long])

/** One condensed one-minute chunk — machine-detail.ts:163-171. */
final case class DataChunk(
    dataAsOfUTCUnixTimestamp: Long,
    statusValue: String,
    productionCountValue: String)
