package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FacadeSpec extends SparkTestBase {
  import spark.implicits._

  private def configTable = Seq(
    ("DEFAULT", "MESSAGE_FORMAT", null, null, null, null, null, null, null),
    ("m1", "MACHINE_CONFIG", "status", "pc", "u", "d", "i", null, null))
    .toDF("id", "type", "machineStatusTagName", "machineProductionCountTagName",
      "machineStatusUpValue", "machineStatusDownValue", "machineStatusIdleValue",
      "uiReferenceMappingLocationKeys", "uiReferenceMappingLineKeys")

  test("point get and full scan") {
    assert(Facade.getConfigItem(configTable, "m1", "MACHINE_CONFIG").count() == 1)
    assert(Facade.getConfigItem(configTable, "mX", "MACHINE_CONFIG").count() == 0)
    assert(Facade.getConfigItems(configTable).count() == 2)
  }

  test("updateMachineConfig SETs attributes on the existing row") {
    val updated = Facade.updateMachineConfig(configTable, "m1",
      "st2", "pc2", "up2", "down2", "idle2")
    val row = updated.filter(col("id") === "m1").head()
    assert(row.getAs[String]("machineStatusTagName") == "st2")
    assert(row.getAs[String]("machineStatusDownValue") == "down2")
    // other rows untouched
    assert(updated.filter(col("id") === "DEFAULT").head()
      .getAs[String]("machineStatusTagName") == null)
  }

  test("updateMachineConfig enforces attribute_exists") {
    intercept[IllegalArgumentException] {
      Facade.updateMachineConfig(configTable, "missing", "a", "b", "c", "d", "e")
    }
  }

  test("updateMachineGrouping upserts the DEFAULT mapping row") {
    implicit val s = spark
    val after = Facade.updateMachineGrouping(configTable, "0/1", "2")
    val row = after.filter(col("type") === "UI_REFERENCE_MAPPING").head()
    assert(row.getAs[String]("uiReferenceMappingLocationKeys") == "0/1")
    // update path: existing row modified, no duplicate
    val again = Facade.updateMachineGrouping(after, "0", "1/2")
    assert(again.filter(col("type") === "UI_REFERENCE_MAPPING").count() == 1)
    assert(again.filter(col("type") === "UI_REFERENCE_MAPPING").head()
      .getAs[String]("uiReferenceMappingLineKeys") == "1/2")
  }

  test("autocreate: empty MACHINE_CONFIG rows for unseen machines only") {
    implicit val s = spark
    val incoming = Seq("m1", "m2", "m2", "m3").toDF("machineId")
    val after = Facade.autocreateMachineConfigs(configTable, incoming)
    val configs = after.filter(col("type") === "MACHINE_CONFIG")
    assert(configs.count() == 3) // m1 existed; m2, m3 created
    assert(configs.filter(col("id") === "m2").head()
      .getAs[String]("machineStatusTagName") == null)
  }

  test("getRealTimeMachineData validates its request (machine-detail.ts:121-145)") {
    val rt = Seq(("STATUS_m1", 100L, "UP")).toDF("id", "messageTimestamp", "value")
    assert(Facade.getRealTimeMachineData(rt, "m1", 60, 120, incrementalRefresh = false).count() == 1)
    intercept[IllegalArgumentException] { Facade.getRealTimeMachineData(rt, " ", 60, 120, incrementalRefresh = false) }
    intercept[IllegalArgumentException] { Facade.getRealTimeMachineData(rt, "m1", 0, 120, incrementalRefresh = false) }
    intercept[IllegalArgumentException] { Facade.getRealTimeMachineData(rt, "m1", 60, 0, incrementalRefresh = false) }
  }

  test("incremental refresh: refreshed chunks replace prior ones, lookback ages out") {
    // prior view computed at t=240 when the 180-chunk was still partial
    val rtOld = Seq(("STATUS_m1", 70L, "UP"), ("STATUS_m1", 130L, "UP"))
      .toDF("id", "messageTimestamp", "value")
    val prior = Facade.getRealTimeMachineData(rtOld, "m1", 60, 240, incrementalRefresh = false)
    // by refresh time, a DOWN arrived at 150 (inside the already-served
    // 180-chunk) plus a new reading at 190
    val rtNow = Seq(("STATUS_m1", 70L, "UP"), ("STATUS_m1", 130L, "UP"),
      ("STATUS_m1", 150L, "DOWN"), ("STATUS_m1", 190L, "UP"))
      .toDF("id", "messageTimestamp", "value")
    // refresh from chunk 120 (overlapping the already-served 180/240
    // chunks) so replacement semantics are observable
    val merged = Facade.refreshRealTimeMachineData(rtNow, "m1", prior,
      lastChunkTimestamp = 120, endTimestamp = 300, lookbackHours = 1)
      .select("dataAsOfUTCUnixTimestamp", "statusValue")
      .as[(Long, String)].collect().toSeq
    // chunk 120 survives from prior; chunk 180 REPLACED by the refreshed
    // value (sticky DOWN); chunks 240/300 come from the refresh window
    assert(merged == Seq((120L, "UP"), (180L, "DOWN"), (240L, "UP"), (300L, "UNKNOWN")))
  }

  test("updateMachineName renames existing UI reference rows") {
    val uiRef = Seq(("m1", "MACHINE", null: String), ("l1", "LINE", "Line 1"))
      .toDF("id", "type", "name")
    val renamed = Facade.updateMachineName(uiRef, "m1", "MACHINE", "Press A")
    assert(renamed.filter(col("id") === "m1").head().getAs[String]("name") == "Press A")
    intercept[IllegalArgumentException] {
      Facade.updateMachineName(uiRef, "nope", "MACHINE", "x")
    }
  }
}
