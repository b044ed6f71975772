package graft.api

import graft.query.MachineDetail
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Thin façade mirroring the reference's GraphQL surface
 * (schema.graphql:10-22) as pure DataFrame operations over the two KV
 * tables. Tables are passed in and returned functionally — persistence
 * (parquet overwrite, Delta MERGE) is the caller's concern, which keeps
 * these testable and storage-agnostic.
 *
 * Table shapes:
 *  - config:   (id, type, attrs…) — ConfigTable (appsync-api-construct.ts:31-39)
 *  - uiRef:    (id, type, name, machineStatus, machineStatusUpdatedTimestamp)
 *              — UIReferenceTable (:41-49)
 *
 * Upsert semantics match the VTL resolvers: `updateMachineConfig` /
 * `updateMachineName` REQUIRE the row to exist (`attribute_exists(id)`,
 * update-machine-config-req.vtl:28-30) while `updateMachineGrouping`
 * writes the DEFAULT mapping unconditionally
 * (update-machine-grouping-req.vtl).
 */
object Facade {

  /** getConfigItem(id, type) — point lookup (S9, get-item-req.vtl). */
  def getConfigItem(config: DataFrame, id: String, itemType: String): DataFrame =
    config.filter(col("id") === id && col("type") === itemType).limit(1)

  /** getConfigItems — full scan (S7). */
  def getConfigItems(config: DataFrame): DataFrame = config

  def getUiReferenceItem(uiRef: DataFrame, id: String, itemType: String): DataFrame =
    uiRef.filter(col("id") === id && col("type") === itemType).limit(1)

  def getUiReferenceItems(uiRef: DataFrame): DataFrame = uiRef

  /** getRealTimeMachineData — the condensation query (SURVEY §3.2),
   * with the reference's request validation
   * (machine-detail.ts:121-145): positive timestamps, non-blank id,
   * and `incrementalRefresh` REQUIRED (:142-144 — the request is
   * rejected when absent; here the parameter's presence is enforced by
   * the signature). The flag doesn't change the query result — it only
   * gates the reference's page-load metric — but the refresh WORKFLOW
   * it belongs to is [[refreshRealTimeMachineData]]. */
  def getRealTimeMachineData(realTime: DataFrame, machineId: String,
      startTimestamp: Long, endTimestamp: Long, incrementalRefresh: Boolean): DataFrame = {
    require(startTimestamp > 0, s"startTimestamp ($startTimestamp) must be a valid unix timestamp")
    require(endTimestamp > 0, s"endTimestamp ($endTimestamp) must be a valid unix timestamp")
    require(machineId != null && machineId.trim.nonEmpty, "id was not passed")
    MachineDetail.realTimeMachineData(realTime, machineId, startTimestamp, endTimestamp)
  }

  /**
   * The dashboard's incremental refresh (web-ui MachineDetail.tsx:
   * 123-129 + 61-96): re-condense from the LAST chunk's timestamp to
   * now, merge keep-new into the prior chunks, and age out chunks past
   * the lookback window. `lastChunkTimestamp` is the most recent
   * `dataAsOfUTCUnixTimestamp` the caller holds (the UI reads it off
   * its chart state; passing it keeps this pure — no action on
   * `priorChunks`).
   */
  def refreshRealTimeMachineData(realTime: DataFrame, machineId: String,
      priorChunks: DataFrame, lastChunkTimestamp: Long, endTimestamp: Long,
      lookbackHours: Int = 12): DataFrame = {
    val refreshed = getRealTimeMachineData(realTime, machineId,
      lastChunkTimestamp, endTimestamp, incrementalRefresh = true)
    MachineDetail.mergeChunks(priorChunks, refreshed)
      .filter(col("dataAsOfUTCUnixTimestamp") > endTimestamp - lookbackHours * 3600L)
      .orderBy("dataAsOfUTCUnixTimestamp")
  }

  private def keyMatch(id: String, itemType: String) =
    col("id") === id && col("type") === itemType

  /**
   * updateMachineConfig: SET the five config attributes on the existing
   * (id, MACHINE_CONFIG) row. Throws when the row does not exist
   * (attribute_exists condition). Returns the updated table.
   */
  def updateMachineConfig(config: DataFrame, id: String,
      statusTag: String, productionCountTag: String,
      upValues: String, downValues: String, idleValues: String): DataFrame = {
    require(!config.filter(keyMatch(id, "MACHINE_CONFIG")).isEmpty,
      s"conditional check failed: no MACHINE_CONFIG row for $id (attribute_exists)")
    val hit = keyMatch(id, "MACHINE_CONFIG")
    config
      .withColumn("machineStatusTagName", when(hit, statusTag).otherwise(col("machineStatusTagName")))
      .withColumn("machineProductionCountTagName", when(hit, productionCountTag).otherwise(col("machineProductionCountTagName")))
      .withColumn("machineStatusUpValue", when(hit, upValues).otherwise(col("machineStatusUpValue")))
      .withColumn("machineStatusDownValue", when(hit, downValues).otherwise(col("machineStatusDownValue")))
      .withColumn("machineStatusIdleValue", when(hit, idleValues).otherwise(col("machineStatusIdleValue")))
  }

  /** updateMachineName: rename an existing UI-reference row
   * (attribute_exists, update-machine-name-req.vtl:16-18). */
  def updateMachineName(uiRef: DataFrame, id: String, itemType: String, name: String): DataFrame = {
    require(!uiRef.filter(keyMatch(id, itemType)).isEmpty,
      s"conditional check failed: no $itemType row for $id (attribute_exists)")
    uiRef.withColumn("name", when(keyMatch(id, itemType), name).otherwise(col("name")))
  }

  /** updateMachineGrouping: unconditional upsert of the DEFAULT
   * UI_REFERENCE_MAPPING row (update-machine-grouping-req.vtl). */
  def updateMachineGrouping(config: DataFrame, locationKeys: String, lineKeys: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hit = keyMatch("DEFAULT", "UI_REFERENCE_MAPPING")
    val exists = !config.filter(hit).isEmpty
    val updated =
      if (exists)
        config
          .withColumn("uiReferenceMappingLocationKeys", when(hit, locationKeys).otherwise(col("uiReferenceMappingLocationKeys")))
          .withColumn("uiReferenceMappingLineKeys", when(hit, lineKeys).otherwise(col("uiReferenceMappingLineKeys")))
      else {
        val cols = config.columns
        val newRow = Seq(("DEFAULT", "UI_REFERENCE_MAPPING", locationKeys, lineKeys))
          .toDF("id", "type", "uiReferenceMappingLocationKeys", "uiReferenceMappingLineKeys")
        val aligned = cols.foldLeft(newRow) { (df, c) =>
          if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
        }.select(cols.map(col): _*)
        config.unionByName(aligned)
      }
    updated
  }

  /** First-sight machine config autocreate — empty config row per new
   * machine (filter-kinesis-stream/index.ts:358-378). */
  def autocreateMachineConfigs(config: DataFrame, newMachineIds: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    val existing = config.filter(col("type") === "MACHINE_CONFIG").select(col("id"))
    val toCreate = newMachineIds.select(col("machineId").as("id"))
      .distinct()
      .join(existing, Seq("id"), "left_anti")
      .withColumn("type", lit("MACHINE_CONFIG"))
    val aligned = config.columns.foldLeft(toCreate) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }.select(config.columns.map(col): _*)
    config.unionByName(aligned)
  }
}
