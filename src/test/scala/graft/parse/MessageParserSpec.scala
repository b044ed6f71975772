package graft.parse

import graft.SparkTestBase
import graft.model.{MachineStatus, MessageFormatConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/**
 * Golden tests ported from the reference's parser suite
 * (filter-kinesis-stream/test/machine-data-parser.spec.ts) — exact
 * parsed output per input, every format-rejection reason, strict
 * timestamp, config-driven (remapped) key names.
 */
class MessageParserSpec extends SparkTestBase {
  import spark.implicits._

  private val default = MessageFormatConfig(id = "DEFAULT")
  // The reference test fixture's remapped key names
  // (machine-data-parser.spec.ts:18-28): proves parsing is config-driven.
  private val remapped = MessageFormatConfig(
    id = "REMAPPED", messagesKey = "mkn", aliasKey = "akn", qualityKey = "qkn",
    timestampKey = "tkn", valueKey = "vkn")

  private val goodTs = "2021-03-05 18:16:10.517000+00:00" // epoch 1614968170

  private def envelope(alias: String = "site/area/process/machine/status",
      quality: String = "GOOD", ts: String = goodTs, value: String = "\"u\""): String =
    s"""{"messages":[{"name":"$alias","quality":"$quality","timestamp":"$ts","value":$value}]}"""

  private def parseOne(json: String, formats: Seq[MessageFormatConfig] = Seq(default)) =
    MessageParser.parse(Seq(json).toDF("payload"), col("payload"), formats)

  test("golden parse: alias split, epoch seconds, stringified value") {
    val rows = parseOne(envelope())
      .select("machineId", "tag", "value", "quality", "epoch_s").collect()
    assert(rows.toSeq == Seq(Row("site/area/process/machine", "status", "u", "GOOD", 1614968170L)))
  }

  test("numeric and boolean JSON values are coerced to strings") {
    val rows = parseOne(envelope(value = "100"))
      .unionByName(parseOne(envelope(value = "true")))
      .select("value").as[String].collect().toSet
    assert(rows == Set("100", "true"))
  }

  test("ZZ offset: compact +0000 parses to the same instant as +00:00") {
    val compact = parseOne(envelope(ts = "2021-03-05 18:16:10.517000+0000"))
    assert(compact.select("epoch_s").as[Long].head() == 1614968170L)
  }

  test("strict timestamp: wrong format rejected (moment strict parity)") {
    assert(parseOne(envelope(ts = "2021-03-05 18:16:10")).count() == 0)
    assert(parseOne(envelope(ts = "2021/03/05 18:16:10.517000+00:00")).count() == 0)
  }

  test("rejection: blank alias, blank quality, missing value, 1-token alias") {
    assert(parseOne(envelope(alias = " ")).count() == 0)
    assert(parseOne(envelope(quality = " ")).count() == 0)
    assert(parseOne("""{"messages":[{"name":"a/b","quality":"GOOD","timestamp":"%s"}]}"""
      .format(goodTs)).count() == 0)
    assert(parseOne(envelope(alias = "machine-no-delimiter")).count() == 0)
  }

  test("rejection: not an array / bad JSON; empty messages matches with zero rows") {
    assert(parseOne("""{"messages": 5}""").count() == 0)
    // an empty array IS a format match (machine-data-parser.ts:105-148:
    // the per-message loop never runs) — it parses to zero messages and
    // must NOT land in the reject side-channel
    assert(parseOne("""{"messages": []}""").count() == 0)
    assert(MessageParser.rejects(
      Seq("""{"messages": []}""").toDF("payload"), col("payload"), Seq(default)).count() == 0)
    assert(parseOne("""not json at all""").count() == 0)
  }

  test("one bad message fails the whole envelope for that format") {
    val twoMsgs =
      s"""{"messages":[
         |{"name":"a/b","quality":"GOOD","timestamp":"$goodTs","value":"1"},
         |{"name":"a/b","quality":"GOOD","timestamp":"bad","value":"1"}]}""".stripMargin
    assert(parseOne(twoMsgs).count() == 0)
  }

  test("config-driven key names: remapped format parses, default does not") {
    val json =
      s"""{"mkn":[{"akn":"site/area/process/machine/status","qkn":"GOOD","tkn":"$goodTs","vkn":"d"}]}"""
    assert(parseOne(json, Seq(default)).count() == 0)
    val viaRemapped = parseOne(json, Seq(default, remapped))
    assert(viaRemapped.select("format_id").as[String].head() == "REMAPPED")
    assert(viaRemapped.select("value").as[String].head() == "d")
  }

  test("first matching format wins (dispatch order)") {
    val json = envelope()
    val parsed = parseOne(json, Seq(remapped, default))
    assert(parsed.select("format_id").as[String].head() == "DEFAULT")
  }

  test("classification + status decode incl. multi-value lists") {
    // multi-value fixture test/index.spec.ts:47-55
    val cfg = Seq(("site/area/process/machine", "status", "pc",
      "u, true,True, 200", "d, false, False, 500", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    def decoded(value: String): Row = {
      val parsed = parseOne(envelope(value = value))
      MessageParser.classify(parsed, cfg)
        .select("isStatusMsg", "isProductionCountMsg", "machineStatus").head()
    }
    assert(decoded("\"u\"") == Row(true, false, MachineStatus.Up))
    assert(decoded("true") == Row(true, false, MachineStatus.Up))
    assert(decoded("200") == Row(true, false, MachineStatus.Up))
    assert(decoded("\"d\"") == Row(true, false, MachineStatus.Down))
    assert(decoded("false") == Row(true, false, MachineStatus.Down))
    assert(decoded("500") == Row(true, false, MachineStatus.Down))
    assert(decoded("\"i\"") == Row(true, false, MachineStatus.Idle))
    // unknown status value leaves machineStatus unset (spec.ts:327-348)
    assert(decoded("\"z\"") == Row(true, false, null))
  }

  test("production count msg: passthrough, no status decode") {
    val cfg = Seq(("site/area/process/machine", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    val parsed = parseOne(envelope(alias = "site/area/process/machine/pc", value = "100"))
    val row = MessageParser.classify(parsed, cfg)
      .select("isStatusMsg", "isProductionCountMsg", "machineStatus", "value").head()
    assert(row == Row(false, true, null, "100"))
  }

  test("no machine config: both flags false") {
    val cfg = spark.emptyDataFrame
      .withColumn("machineId", lit("x")).withColumn("statusTag", lit("s"))
      .withColumn("productionCountTag", lit("p"))
      .withColumn("statusUpValues", lit("u")).withColumn("statusDownValues", lit("d"))
      .withColumn("statusIdleValues", lit("i"))
      .limit(0)
    val row = MessageParser.classify(parseOne(envelope()), cfg)
      .select("isStatusMsg", "isProductionCountMsg").head()
    assert(row == Row(false, false))
  }

  test("typed view: classified messages as Dataset[TagMessage]") {
    val cfg = Seq(("site/area/process/machine", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    val ds = MessageParser.toTagMessages(
      MessageParser.classify(parseOne(envelope()), cfg))
    val m = ds.head()
    assert(m == graft.model.TagMessage("site/area/process/machine", "status", "u",
      "GOOD", 1614968170L, isStatusMsg = true, isProductionCountMsg = false, Some("UP")))
  }

  test("non-trailing offset token: compact shape still parses (coalesce fallback)") {
    // moment allows Z anywhere; the end-anchored normalization can't
    // reach a leading offset, so this format must take the two-variant
    // coalesce and still accept BOTH offset shapes
    val fmt = MessageFormatConfig(id = "ZFIRST", timestampFormat = "Z YYYY-MM-DD HH:mm:ss")
    val colonOk = parseOne(envelope(ts = "+00:00 2021-03-05 18:16:10"), Seq(fmt))
    val compactOk = parseOne(envelope(ts = "+0000 2021-03-05 18:16:10"), Seq(fmt))
    assert(colonOk.select("epoch_s").as[Long].head() == 1614968170L)
    assert(compactOk.select("epoch_s").as[Long].head() == 1614968170L,
      "compact non-trailing offset regressed vs moment(.., true) parity")
    assert(parseOne(envelope(ts = "+9x99 2021-03-05 18:16:10"), Seq(fmt)).count() == 0)
  }

  test("moment X format: epoch-seconds timestamps parse strictly") {
    val epochFmt = MessageFormatConfig(id = "EPOCH", timestampFormat = "X")
    val ok = parseOne(envelope(ts = "1614968170"), Seq(epochFmt))
    assert(ok.select("epoch_s").as[Long].head() == 1614968170L)
    assert(parseOne(envelope(ts = "not-a-number"), Seq(epochFmt)).count() == 0)
  }

  test("multi-delimiter formats: each row splits with its own format's delimiter") {
    val dotted = MessageFormatConfig(id = "DOTTED", aliasDelimiter = ".")
    val dashed = MessageFormatConfig(id = "DASHED", messagesKey = "msgs2",
      aliasDelimiter = "--")
    val jsonDot = s"""{"messages":[{"name":"site.area.machine.status","quality":"GOOD","timestamp":"$goodTs","value":"u"}]}"""
    val jsonDash = s"""{"msgs2":[{"name":"site--machine--pc","quality":"GOOD","timestamp":"$goodTs","value":"9"}]}"""
    val out = MessageParser.parse(Seq(jsonDot, jsonDash).toDF("payload"),
      col("payload"), Seq(dotted, dashed))
      .select("format_id", "machineId", "tag").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      ("DOTTED", "site.area.machine", "status"),
      ("DASHED", "site--machine", "pc")))
  }

  test("rejects side-channel captures non-matching envelopes with payload") {
    val mixed = Seq(envelope(), """{"nope": true}""", envelope(ts = "bad")).toDF("payload")
    val rej = MessageParser.rejects(mixed, col("payload"), Seq(default))
      .as[String].collect().toSet
    assert(rej == Set("""{"nope": true}""", envelope(ts = "bad")))
  }

  test("toRealTime: series key + TTL synthesis") {
    val cfg = Seq(("site/area/process/machine", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    val classified = MessageParser.classify(parseOne(envelope()), cfg)
    val rt = MessageParser.toRealTime(classified, expirationHours = 24).head()
    assert(rt == Row("STATUS_site/area/process/machine", 1614968170L, "u",
      1614968170L + 24 * 3600))
  }

  test("non-status/non-prod messages are dropped before the sink (P5)") {
    val cfg = Seq(("site/area/process/machine", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")
    val other = parseOne(envelope(alias = "site/area/process/machine/temperature"))
    assert(MessageParser.toRealTime(MessageParser.classify(other, cfg)).count() == 0)
  }
}
