package graft.parse

import graft.model.{MessageFormatConfig, UiReferenceMapping}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Runtime config loading — the reference hydrates its parser from
 * ConfigTable rows at cold start (filter-kinesis-stream/index.ts:250-280);
 * here the same wide sparse rows become typed configs (driver-side
 * collect of a dimension-sized table) and a classify()-shaped machine
 * config DataFrame.
 *
 * Column names follow the reference's item attributes
 * (gql-schema-interfaces.ts:11-32).
 */
object ConfigLoader {

  private def strOpt(r: Row, name: String): Option[String] =
    if (!r.schema.fieldNames.contains(name)) None
    else Option(r.getAs[String](name)).filter(_.nonEmpty)

  /** MESSAGE_FORMAT rows → parser format configs (stable id order:
   * dispatch tries them deterministically). */
  def messageFormats(config: DataFrame): Seq[MessageFormatConfig] =
    config.filter(col("type") === "MESSAGE_FORMAT")
      .collect().toSeq
      .map { r =>
        val d = MessageFormatConfig(id = r.getAs[String]("id"))
        MessageFormatConfig(
          id = d.id,
          messagesKey = strOpt(r, "msgFormatDataMessagesKeyName").getOrElse(d.messagesKey),
          aliasKey = strOpt(r, "msgFormatDataMessageAliasKeyName").getOrElse(d.aliasKey),
          qualityKey = strOpt(r, "msgFormatDataMessageQualityKeyName").getOrElse(d.qualityKey),
          timestampKey = strOpt(r, "msgFormatDataMessageTimestampKeyName").getOrElse(d.timestampKey),
          valueKey = strOpt(r, "msgFormatDataMessageValueKeyName").getOrElse(d.valueKey),
          timestampFormat = strOpt(r, "msgFormatDataMessageTimestampFormat").getOrElse(d.timestampFormat),
          aliasDelimiter = strOpt(r, "msgFormatDataAliasDelimiter").getOrElse(d.aliasDelimiter))
      }
      .sortBy(_.id)

  /** MACHINE_CONFIG rows → the DataFrame shape MessageParser.classify
   * expects (stays distributed — it's broadcast-joined, not collected). */
  def machineConfigs(config: DataFrame): DataFrame =
    config.filter(col("type") === "MACHINE_CONFIG")
      .select(
        col("id").as("machineId"),
        col("machineStatusTagName").as("statusTag"),
        col("machineProductionCountTagName").as("productionCountTag"),
        col("machineStatusUpValue").as("statusUpValues"),
        col("machineStatusDownValue").as("statusDownValues"),
        col("machineStatusIdleValue").as("statusIdleValues"))

  /** UI_REFERENCE_MAPPING row → mapping (defaults when absent —
   * solution-helper-construct.ts:150-153). */
  def uiReferenceMapping(config: DataFrame): UiReferenceMapping = {
    val rows = config.filter(col("type") === "UI_REFERENCE_MAPPING").collect()
    rows.headOption.map { r =>
      val d = UiReferenceMapping()
      UiReferenceMapping(
        strOpt(r, "uiReferenceMappingLocationKeys").getOrElse(d.locationKeys),
        strOpt(r, "uiReferenceMappingLineKeys").getOrElse(d.lineKeys))
    }.getOrElse(UiReferenceMapping())
  }
}
