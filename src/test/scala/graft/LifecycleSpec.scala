package graft

import graft.parse.{ConfigLoader, MessageParser}
import graft.query.{Dimensions, Downtime, MachineDetail, Rollups}
import graft.sources.{DimensionSink, UiReferenceStore, Warehouse}
import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Full-lifecycle integration: everything a user of the reference runs,
 * end-to-end through this engine — config table → streaming ingest
 * (facts + suppressed state) → interactive condensation → nightly
 * archive/ETL → downtime durations → dimension CSVs → rollups.
 * One factory day, every module, real data flow between them.
 */
class LifecycleSpec extends SparkTestBase {
  import spark.implicits._

  test("factory day: ingest → dashboards → nightly BI, all from the config table") {
    val dir = Files.createTempDirectory("graft-life").toString
    implicit val s = spark

    // 1. Config table: seeded defaults + one machine config (FIXTURES §2)
    val config = Seq(
      ("DEFAULT", "MESSAGE_FORMAT", null, null, null, null, null, null, null, "/", "messages", "name", "quality", "timestamp", "YYYY-MM-DD HH:mm:ss.SSSSSSZZ", "value"),
      ("DEFAULT", "UI_REFERENCE_MAPPING", null, null, null, null, null, "0/1", "2", null, null, null, null, null, null, null),
      ("site/area/process/press", "MACHINE_CONFIG", "status", "count", "u, true,True, 200", "d, false, False, 500", "i", null, null, null, null, null, null, null, null, null))
      .toDF("id", "type", "machineStatusTagName", "machineProductionCountTagName",
        "machineStatusUpValue", "machineStatusDownValue", "machineStatusIdleValue",
        "uiReferenceMappingLocationKeys", "uiReferenceMappingLineKeys",
        "msgFormatDataAliasDelimiter", "msgFormatDataMessagesKeyName",
        "msgFormatDataMessageAliasKeyName", "msgFormatDataMessageQualityKeyName",
        "msgFormatDataMessageTimestampKeyName", "msgFormatDataMessageTimestampFormat",
        "msgFormatDataMessageValueKeyName")

    val formats = ConfigLoader.messageFormats(config)
    assert(formats.map(_.id) == Seq("DEFAULT") && formats.head.aliasDelimiter == "/")
    val machineConfigs = ConfigLoader.machineConfigs(config)
    val mapping = ConfigLoader.uiReferenceMapping(config)

    // 2. A day of telemetry: press runs UP, dips DOWN mid-day, recovers;
    //    counter increments and rolls over once.
    val base = 1614902400L // 2021-03-05 00:00:00 UTC
    def at(off: Long) = {
      val instant = java.time.Instant.ofEpochSecond(base + off)
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC).format(instant) + "+00:00"
    }
    val readings =
      Seq((0L, "status", "u"), (3600L, "count", "100"), (7200L, "status", "d"),
        (7260L, "count", "150"), (10800L, "status", "u"), (14400L, "count", "20"),
        (18000L, "count", "80"))
    val payloads = readings.map { case (off, tag, v) =>
      val json = s"""{"messages":[{"name":"site/area/process/press/$tag","quality":"GOOD","timestamp":"${at(off)}","value":"$v"}]}"""
      (java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8")), base + off)
    }

    // 3. Streaming ingest with suppression + state merge + raw archive
    val statePath = s"$dir/state"
    val factDir = s"$dir/facts"
    val parsed = MessageParser.classify(
      MessageParser.parseBase64(payloads.toDF("payload", "epoch"), col("payload"), formats),
      machineConfigs)
    MessageParser.toRealTime(parsed).write.parquet(factDir)
    val statusUpdates = parsed.filter(col("isStatusMsg"))
      .select(col("machineId"), col("machineStatus"), col("epoch_s")).collect()
      .map(r => IngestPipeline.StatusUpdate(r.getString(0), r.getString(1), r.getLong(2)))
    UiReferenceStore.merge(spark, statePath, statusUpdates.toSeq.toDS())
    assert(UiReferenceStore.asInitialState(spark, statePath).collect().toSet ==
      Set(("site/area/process/press", "UP"))) // last transition wins

    // 4. Interactive condensation over the DOWN window
    val rt = spark.read.parquet(factDir)
    val chunks = MachineDetail.realTimeMachineData(rt, "site/area/process/press",
      base + 7100, base + 7400).as[(Long, String, String)].collect()
    assert(chunks.exists(_._2 == "d")) // raw DOWN value surfaces in its minute

    // 4b. Dashboard auto-refresh (60 s cycle): a LATE DOWN lands inside
    // an already-served chunk; the incremental refresh re-condenses
    // from the client's last chunks and replaces them keep-new.
    val prior = graft.api.Facade.getRealTimeMachineData(rt, "site/area/process/press",
      base + 7100, base + 7400, incrementalRefresh = false)
      .localCheckpoint(true) // client-held snapshot: pin it before facts change
    assert(prior.filter(col("dataAsOfUTCUnixTimestamp") === (base + 7380))
      .head().getString(1) == "UNKNOWN") // nothing in (7320, 7380] yet
    val latePayload = {
      val json = s"""{"messages":[{"name":"site/area/process/press/status","quality":"GOOD","timestamp":"${at(7350)}","value":"d"}]}"""
      java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
    }
    val lateParsed = MessageParser.classify(MessageParser.parseBase64(
      Seq((latePayload, base + 7350)).toDF("payload", "epoch"), col("payload"), formats),
      machineConfigs)
    MessageParser.toRealTime(lateParsed).write.mode("append").parquet(factDir)
    val merged = graft.api.Facade.refreshRealTimeMachineData(
      spark.read.parquet(factDir), "site/area/process/press",
      prior, lastChunkTimestamp = base + 7320, endTimestamp = base + 7400,
      lookbackHours = 12)
    assert(merged.filter(col("dataAsOfUTCUnixTimestamp") === (base + 7380))
      .head().getString(1) == "d") // refreshed chunk replaced the served one

    // 5. Nightly: raw archive → day ETL → warehouse → downtime durations
    Warehouse.archiveRaw(payloads.toDF("payload", "epoch"), "payload", "epoch", s"$dir/raw")
    val n = Warehouse.runDailyEtl(spark, s"$dir/raw", s"$dir/wh", formats, 2021, 3, 5)
    assert(n == 7)
    val wh = spark.read.parquet(s"$dir/wh")
      .withColumn("timestamp", to_timestamp(col("timestamp"), "yyyy/MM/dd HH:mm:ss.SSSSSS"))
    val downDecode = Dimensions.machineConfigInformation(
      machineConfigs.select(col("machineId"), col("statusTag"), col("statusDownValues")))
    val machineInfo = Dimensions.machineInformation(
      Seq(("site/area/process/press", null.asInstanceOf[String])).toDF("id", "name"),
      "/", mapping)
    val downtime = Downtime.enrich(
      Downtime.downtimeSegments(Downtime.durations(wh), downDecode), machineInfo)
      .collect()
    assert(downtime.length == 1)
    val seg = downtime.head
    assert(seg.getAs[Double]("duration_seconds") == 3600.0) // DOWN 02:00→03:00
    assert(seg.getAs[String]("location") == "site/area")
    assert(seg.getAs[String]("line") == "process")

    // 6. Dimension CSV + rollups
    DimensionSink.writeCsv(machineInfo, s"$dir/dim")
    assert(new java.io.File(s"$dir/dim").listFiles().exists(_.getName.endsWith(".csv")))
    val total = Rollups.totalProduction(
      rt.filter(col("id").startsWith("PRODUCTION_COUNT_"))
        .select(lit("press").as("machineId"), col("messageTimestamp").as("ts"),
          col("value").cast("long").as("count")))
      .as[(String, Long)].head()
    assert(total._2 == 230L) // 150 banked at rollover + final 80
  }
}
