package graft.parse

import graft.model.{MachineStatus, MessageFormatConfig, MsgType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Config-driven tag-message parsing, re-expressed as declarative Spark
 * transforms (no UDFs — everything stays inside whole-stage codegen).
 *
 * Reference behavior being matched (machine-data-parser.ts):
 *  - base64+JSON decode, bad records dropped           (:42-50)
 *  - candidate formats tried in order, first match wins (:105-149)
 *  - per-message validity: alias/quality/value/timestamp present,
 *    non-null, non-blank; timestamp parses STRICTLY against the
 *    configured moment format; alias splits into ≥2 tokens (:128-148)
 *  - alias → (machineId, tag) split on the configured
 *    delimiter, last token = tag                        (:62-68)
 *  - value stringified everywhere                       (index.ts:322)
 *
 * Scale notes: every step here is a narrow transform — no shuffle, no
 * driver-side loop over data. The only driver-side iteration is over
 * the handful of format configs (small, config-not-data). Validity is
 * a single `forall` pass over each envelope's message array.
 */
object MessageParser {

  /** Envelope schema for one format config: {messagesKey: [{alias, quality, ts, value}]}.
   * All leaf fields read as STRING — from_json coerces JSON numbers and
   * booleans to their text form, mirroring the reference's stringify-
   * everything behavior (SURVEY §1.2). */
  private def envelopeSchema(f: MessageFormatConfig): StructType =
    StructType(Seq(StructField(f.messagesKey, ArrayType(StructType(Seq(
      StructField(f.aliasKey, StringType),
      StructField(f.qualityKey, StringType),
      StructField(f.timestampKey, StringType),
      StructField(f.valueKey, StringType)))))))

  private def nonBlank(c: Column): Column = c.isNotNull && trim(c) =!= ""

  private def quoted(delim: String): String = java.util.regex.Pattern.quote(delim)

  /** Strict timestamp parse: null on mismatch (moment(.., true) parity). */
  def strictTimestamp(c: Column, momentFmt: String): Column =
    try_to_timestamp(c, lit(MomentFormat.toJavaTime(momentFmt)))

  /** base64 → utf8 JSON string (S2 / F1). */
  def decodeBase64(c: Column): Column = unbase64(c).cast(StringType)

  /**
   * Parse a column of JSON envelope strings into one row per tag message.
   *
   * Output columns: `format_id, alias, quality, value, ts (timestamp),
   * epoch_s (long), machineId, tag` plus every input column.
   * Envelopes matching no candidate format are dropped (the reference
   * skips them per-record, index.ts:86-90).
   */
  def parse(df: DataFrame, jsonCol: Column, formats: Seq[MessageFormatConfig]): DataFrame = {
    require(formats.nonEmpty, "at least one MessageFormatConfig required")

    // Per-format: parsed messages (normalized field names) + validity.
    def attempt(f: MessageFormatConfig): (Column, Column) = {
      val parsed = from_json(jsonCol, envelopeSchema(f))
      val msgs = parsed.getField(f.messagesKey)
      val norm = transform(msgs, m =>
        struct(
          m.getField(f.aliasKey).as("alias"),
          m.getField(f.qualityKey).as("quality"),
          m.getField(f.valueKey).as("value"),
          strictTimestamp(m.getField(f.timestampKey), f.timestampFormat).as("ts")))
      val valid = msgs.isNotNull && size(msgs) > 0 && forall(norm, m =>
        nonBlank(m.getField("alias")) &&
          nonBlank(m.getField("quality")) &&
          nonBlank(m.getField("value")) &&
          m.getField("ts").isNotNull &&
          size(split(m.getField("alias"), quoted(f.aliasDelimiter))) >= 2)
      (valid, norm)
    }

    // First-match dispatch (machine-data-parser.ts:105-121): a chained
    // CASE WHEN over the candidate formats, evaluated row-at-a-time in
    // codegen — the Spark analogue of the reference's per-record loop.
    val attempts = formats.map(f => (f, attempt(f)))
    val dispatched = attempts.foldRight(lit(null).cast(
      StructType(Seq(StructField("format_id", StringType),
        StructField("delim", StringType),
        StructField("msgs", ArrayType(StructType(Seq(
          StructField("alias", StringType), StructField("quality", StringType),
          StructField("value", StringType), StructField("ts", TimestampType)))))))).as("d")) {
      case ((f, (valid, norm)), rest) =>
        when(valid, struct(lit(f.id).as("format_id"), lit(f.aliasDelimiter).as("delim"), norm.as("msgs"))).otherwise(rest)
    }

    val delims = formats.map(_.aliasDelimiter).distinct
    val withMsg = df
      .withColumn("_env", dispatched)
      .filter(col("_env").isNotNull)
      .withColumn("_m", explode(col("_env.msgs")))
      .withColumn("format_id", col("_env.format_id"))
      .withColumn("alias", col("_m.alias"))
      .withColumn("quality", col("_m.quality"))
      .withColumn("value", col("_m.value"))
      .withColumn("ts", col("_m.ts"))
      .withColumn("epoch_s", unix_timestamp(col("_m.ts")))

    // alias → (machineId, tag): last token is the tag, the rest rejoined
    // is the machine id (machine-data-parser.ts:62-68 / P2).
    val tokens = delims match {
      case Seq(single) => split(col("alias"), quoted(single))
      case _ => split(col("alias"), quoted(delims.head)) // heterogenous delims: resolved per-row below
    }
    val withSplitCols =
      if (delims.sizeIs == 1) {
        withMsg
          .withColumn("_tok", tokens)
          .withColumn("machineId", array_join(slice(col("_tok"), lit(1), size(col("_tok")) - 1), delims.head))
          .withColumn("tag", element_at(col("_tok"), -1))
      } else {
        // multiple configured delimiters: split with the matched format's own
        val tok = split(col("alias"), col("_env.delim"))
        withMsg
          .withColumn("_tok", tok)
          .withColumn("machineId", array_join(slice(col("_tok"), lit(1), size(col("_tok")) - 1), delims.head))
          .withColumn("tag", element_at(col("_tok"), -1))
      }
    withSplitCols.drop("_env", "_m", "_tok")
  }

  /** Convenience: base64 payloads → parsed messages. */
  def parseBase64(df: DataFrame, b64Col: Column, formats: Seq[MessageFormatConfig]): DataFrame =
    parse(df.withColumn("_json", decodeBase64(b64Col)), col("_json"), formats).drop("_json")

  /** `v ∈ trim-split(list, ',')` — the CSV-membership predicate used by
   * the status decode (machine-data-parser.ts:90-96 / P4). Null list ⇒ false. */
  def csvListContains(list: Column, v: Column): Column =
    coalesce(array_contains(transform(split(list, ","), trim(_)), v), lit(false))

  /**
   * Classification + status decode (P3/P4, J1): broadcast-joins parsed
   * messages to machine configs and derives `isStatusMsg`,
   * `isProductionCountMsg`, `machineStatus`.
   *
   * `machineConfigs` columns: machineId, statusTag, productionCountTag,
   * statusUpValues, statusDownValues, statusIdleValues (comma-separated
   * lists). Missing config ⇒ both flags false (left outer,
   * machine-data-parser.ts:70-75).
   */
  def classify(parsed: DataFrame, machineConfigs: DataFrame): DataFrame = {
    val cfg = broadcast(machineConfigs
      .select(
        col("machineId").as("_cfg_mid"), col("statusTag"), col("productionCountTag"),
        col("statusUpValues"), col("statusDownValues"), col("statusIdleValues")))
    val joined = parsed.join(cfg, parsed("machineId") === cfg("_cfg_mid"), "left_outer")
    val isStatus = coalesce(col("tag") === col("statusTag"), lit(false))
    val isProd = coalesce(col("tag") === col("productionCountTag"), lit(false))
    val status = when(isStatus,
      when(csvListContains(col("statusUpValues"), col("value")), MachineStatus.Up)
        .when(csvListContains(col("statusDownValues"), col("value")), MachineStatus.Down)
        .when(csvListContains(col("statusIdleValues"), col("value")), MachineStatus.Idle))
    joined
      .withColumn("isStatusMsg", isStatus)
      .withColumn("isProductionCountMsg", isProd)
      .withColumn("machineStatus", status)
      .drop("_cfg_mid", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
  }

  /**
   * Real-time fact synthesis (P5/P6): keep status/production-count
   * messages only, synthesize the series key and TTL.
   * Mirrors filter-kinesis-stream/index.ts:60-85.
   */
  def toRealTime(classified: DataFrame, expirationHours: Int = 24): DataFrame = {
    require(expirationHours >= 24, "expiration must be >= 24h (index.ts:119)")
    classified
      .filter(col("isStatusMsg") || col("isProductionCountMsg"))
      .select(
        concat_ws("_",
          when(col("isStatusMsg"), MsgType.Status).otherwise(MsgType.ProductionCount),
          col("machineId")).as("id"),
        col("epoch_s").as("messageTimestamp"),
        col("value"),
        (col("epoch_s") + expirationHours * 3600L).as("expirationTimestamp"))
  }
}
