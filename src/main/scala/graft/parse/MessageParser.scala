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

  /** The raw messages array of one candidate format. */
  private def rawMsgs(jsonCol: Column, f: MessageFormatConfig): Column =
    from_json(jsonCol, envelopeSchema(f)).getField(f.messagesKey)

  /** Normalize a format's messages to the common (alias, quality,
   * value, ts) shape with the strict timestamp parse. */
  private def normalizeMsgs(msgs: Column, f: MessageFormatConfig): Column =
    transform(msgs, m =>
      struct(
        m.getField(f.aliasKey).as("alias"),
        m.getField(f.qualityKey).as("quality"),
        m.getField(f.valueKey).as("value"),
        strictTimestamp(m.getField(f.timestampKey), f.timestampFormat).as("ts")))

  /** Per-envelope validity over a NORMALIZED messages column —
   * the single definition shared by parse() and rejects().
   * A present-but-EMPTY messages array IS a format match (the
   * reference's per-message loop never runs and the matcher returns
   * true, machine-data-parser.ts:105-148) — it simply yields zero
   * messages; only a missing/non-array key fails the format. */
  private def validityOf(norm: Column, f: MessageFormatConfig): Column =
    norm.isNotNull && forall(norm, m =>
      nonBlank(m.getField("alias")) &&
        nonBlank(m.getField("quality")) &&
        nonBlank(m.getField("value")) &&
        m.getField("ts").isNotNull &&
        size(split(m.getField("alias"), quoted(f.aliasDelimiter))) >= 2)

  /** Strict timestamp parse: null on mismatch (moment(.., true) parity).
   * moment's X/x (epoch seconds/millis) aren't java.time patterns and
   * get a numeric-literal special case. Formats with Z/ZZ offsets accept
   * both the colon ("+00:00") and compact ("+0000") offset shapes —
   * moment's offset regex matches both strictly. Rather than coalescing
   * two try_to_timestamp attempts (timestamp parsing dominates the hot
   * path), compact offsets are normalized to the colon shape with one
   * cheap regexp_replace and a SINGLE try_to_timestamp (XXX) runs. */
  def strictTimestamp(c: Column, momentFmt: String): Column =
    if (MomentFormat.isEpochSeconds(momentFmt))
      when(c.rlike("^-?\\d{1,18}$"), timestamp_seconds(c.cast("long")))
    else if (MomentFormat.isEpochMillis(momentFmt))
      when(c.rlike("^-?\\d{1,18}$"), timestamp_millis(c.cast("long")))
    else {
      val variants = MomentFormat.toJavaTimeVariants(momentFmt)
      if (variants.lengthCompare(1) == 0)
        try_to_timestamp(c, lit(variants.head))
      else if (MomentFormat.offsetIsFormatFinal(momentFmt)) {
        // O(1) gate: the compact-offset regex needs 4 trailing digits,
        // so a ':' at position -3 (the colon form "+00:00" — the
        // common case) can never match; skip the regex scan entirely.
        val input = when(substring(c, -3, 1) === ":", c)
          .otherwise(regexp_replace(c, "([+-]\\d{2})(\\d{2})$", "$1:$2"))
        try_to_timestamp(input, lit(variants.head))
      } else
        // offset token not format-final: the end-anchored normalization
        // can't reach it — accept both offset shapes the slow way. Only
        // non-default configs land here; the hot default format keeps
        // the single-parse path above.
        coalesce(variants.map(v => try_to_timestamp(c, lit(v))): _*)
    }

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
    val inputCols = df.columns.map(col).toSeq

    // InferFiltersFromGenerate would synthesize `size(msgs)>0 AND
    // isnotnull(msgs)` from the explode below, and predicate pushdown
    // then inlines the ENTIRE parse chain (from_json + normalization)
    // into a pre-projection Filter — evaluating it several times per
    // row (measured 4x). The inferred filter is redundant here (explode
    // of the null/empty dispatch array already drops those rows).
    //
    // DELIBERATE SESSION-WIDE SETTING: rule exclusion can't be scoped
    // to one plan, so this is an engine-level config (appended,
    // preserving caller exclusions, applied once). Cost to other
    // queries is bounded: the rule only ever adds an inferred
    // not-null/size filter under a Generate, an optimization none of
    // this engine's other plans depend on.
    val spark = df.sparkSession
    val exclKey = "spark.sql.optimizer.excludedRules"
    val rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val cur = spark.conf.getOption(exclKey).getOrElse("")
    if (!cur.contains(rule)) spark.conf.set(exclKey, if (cur.isEmpty) rule else s"$cur,$rule")

    // Performance shape: the pipeline is staged through explicit
    // projections so each expensive step (JSON parse, per-message
    // normalization) is MATERIALIZED once per row. The stages don't
    // collapse back together because each materialized column is
    // referenced more than once downstream and is non-cheap —
    // CollapseProject keeps them separate — and invalid envelopes are
    // dropped by exploding a null array rather than by a Filter that
    // would re-evaluate the parse.

    // Stage 1: one from_json per candidate format.
    val stage1 = df.select(inputCols ++ formats.zipWithIndex.map { case (f, i) =>
      rawMsgs(jsonCol, f).as(s"_msgs_$i")
    }: _*)

    // Stage 2: normalize each format's messages to a common shape
    // (alias, quality, value, ts) with the strict timestamp parse.
    val stage2 = stage1.select(inputCols ++ formats.zipWithIndex.map { case (f, i) =>
      normalizeMsgs(col(s"_msgs_$i"), f).as(s"_norm_$i")
    }: _*)

    // Stage 3: first-match dispatch (machine-data-parser.ts:105-121) —
    // a chained CASE WHEN over the candidate formats, the Spark
    // analogue of the reference's per-record loop.
    def validity(f: MessageFormatConfig, i: Int): Column = validityOf(col(s"_norm_$i"), f)
    val nullStr = lit(null).cast(StringType)
    val dispatchedFmt = formats.zipWithIndex.foldRight(nullStr) { case ((f, i), rest) =>
      when(validity(f, i), lit(f.id)).otherwise(rest)
    }
    val dispatchedDelim = formats.zipWithIndex.foldRight(nullStr) { case ((f, i), rest) =>
      when(validity(f, i), lit(f.aliasDelimiter)).otherwise(rest)
    }
    val dispatchedMsgs = formats.zipWithIndex.foldRight(
      lit(null).cast(ArrayType(StructType(Seq(
        StructField("alias", StringType), StructField("quality", StringType),
        StructField("value", StringType), StructField("ts", TimestampType)))))) {
      case ((f, i), rest) => when(validity(f, i), col(s"_norm_$i")).otherwise(rest)
    }
    val stage3 = stage2.select(inputCols ++ Seq(
      dispatchedFmt.as("format_id"),
      dispatchedDelim.as("_delim"),
      dispatchedMsgs.as("_dmsgs")): _*)

    // Stage 4: null msgs (no matching format) ⇒ row dropped by explode.
    val exploded = stage3.select(inputCols ++ Seq(
      col("format_id"), col("_delim"), explode(col("_dmsgs")).as("_m")): _*)

    // alias → (machineId, tag): last token is the tag, the rest rejoined
    // is the machine id (machine-data-parser.ts:62-68 / P2). The rejoin
    // is suffix arithmetic so it works with a per-row (per-format)
    // delimiter without re-splitting.
    exploded
      .withColumn("alias", col("_m.alias"))
      .withColumn("quality", col("_m.quality"))
      .withColumn("value", col("_m.value"))
      .withColumn("ts", col("_m.ts"))
      .withColumn("epoch_s", unix_timestamp(col("_m.ts")))
      .withColumn("tag", expr("substring_index(alias, _delim, -1)"))
      .withColumn("machineId",
        col("alias").substr(lit(1), length(col("alias")) - length(col("tag")) - length(col("_delim"))))
      .drop("_env", "_m", "_delim")
  }

  /** Convenience: base64 payloads → parsed messages. */
  def parseBase64(df: DataFrame, b64Col: Column, formats: Seq[MessageFormatConfig]): DataFrame =
    parse(df.withColumn("_json", decodeBase64(b64Col)), col("_json"), formats).drop("_json")

  /**
   * Reject side-channel (SURVEY §2.8 error isolation): the envelopes
   * matching NO candidate format, with the raw payload preserved —
   * the reference logs-and-skips these per record (index.ts:86-90);
   * at pipeline scale they belong in a quarantine sink instead.
   */
  def rejects(df: DataFrame, jsonCol: Column, formats: Seq[MessageFormatConfig]): DataFrame = {
    val anyValid = formats
      .map(f => validityOf(normalizeMsgs(rawMsgs(jsonCol, f), f), f))
      .reduce(_ || _)
    df.filter(!coalesce(anyValid, lit(false)))
  }

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

  /** Typed view of classified messages — `Dataset[TagMessage]` for the
   * places compile-time field checks help (streaming folds, tests).
   * The parse stage itself stays DataFrame-typed because its columns
   * are config-driven (SURVEY §1.2). */
  def toTagMessages(classified: DataFrame): org.apache.spark.sql.Dataset[graft.model.TagMessage] = {
    val spark = classified.sparkSession
    import spark.implicits._
    classified.select(
      col("machineId"),
      col("tag"),
      col("value"),
      col("quality"),
      col("epoch_s").as("epochSeconds"),
      col("isStatusMsg"),
      col("isProductionCountMsg"),
      col("machineStatus")).as[graft.model.TagMessage]
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
