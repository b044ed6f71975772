package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The batch BI analytics family — change-point compression, segment
 * durations, downtime filtering, dimension enrichment.
 *
 * The reference computes these with Athena SQL that emulates lag/lead
 * via global ROW_NUMBER + self-joins
 * (solution-helper/create-quicksight.ts:12-49) and QuickSight
 * LogicalTableMap joins (:151-189). Spark-first, the self-joins
 * dissolve into window functions over Window.partitionBy(id, tag)
 * .orderBy(timestamp) — one shuffle on (id, tag) instead of two
 * global-sort self-joins, and the dimension joins broadcast.
 */
object Downtime {

  // (timestamp, value) ordering: the value tie-break makes lag/lead
  // deterministic when two readings share a timestamp (the engine-wide
  // last-value convention).
  private val seriesWindow = Window.partitionBy("id", "tag").orderBy("timestamp", "value")

  /**
   * Change-point compression (J3): keep only rows whose value differs
   * from the previous row in the same (id, tag) series — the first row
   * of each series always survives.
   *
   * Input columns: id, tag, value, quality, timestamp.
   */
  def changePoints(events: DataFrame): DataFrame =
    events
      .withColumn("_prev", lag(col("value"), 1).over(seriesWindow))
      .filter(col("_prev").isNull || col("_prev") =!= col("value"))
      .drop("_prev")

  /**
   * Segment durations (J4 + A10): each change-point's duration runs to
   * the NEXT change-point in the same series; the last (open) segment
   * of each series is dropped (the reference's `WHERE j1.id = j2.id`
   * turns the outer join inner — create-quicksight.ts:46-48).
   */
  def segmentDurations(changePts: DataFrame): DataFrame = {
    val next = lead(col("timestamp"), 1).over(seriesWindow)
    changePts
      .withColumn("_next_ts", next)
      .filter(col("_next_ts").isNotNull)
      .withColumn("duration_seconds",
        unix_timestamp(col("_next_ts")).cast("double") - unix_timestamp(col("timestamp")).cast("double"))
      .withColumn("duration_minutes", col("duration_seconds") / 60)
      .withColumn("duration_hours", col("duration_seconds") / 60 / 60)
      .drop("_next_ts")
  }

  /** changePoints + segmentDurations in one pass: a single shuffle on
   * (id, tag) serves both window computations. */
  def durations(events: DataFrame): DataFrame =
    segmentDurations(changePoints(events))

  /**
   * Downtime filter join (J5): inner join against the pre-exploded
   * down-value decode table `(id, status_tag, down_value)` — one row per
   * comma-separated down value (configuration.py:291-294) — so the join
   * itself selects DOWN segments. Decode table is dimension-sized ⇒
   * broadcast.
   */
  def downtimeSegments(durationsDf: DataFrame, downDecode: DataFrame): DataFrame =
    durationsDf.join(
      broadcast(downDecode.select(
        col("id").as("_cid"), col("status_tag"), col("down_value"))),
      durationsDf("id") === col("_cid") &&
        durationsDf("tag") === col("status_tag") &&
        durationsDf("value") === col("down_value"),
      "inner")
      .drop("_cid", "status_tag", "down_value")

  /**
   * Machine-info enrichment (J6): broadcast join to
   * `machine_information(id, machine_name, location, line)` and project
   * the reference's 11 output columns (create-quicksight.ts:162-189).
   */
  def enrich(downtime: DataFrame, machineInfo: DataFrame): DataFrame =
    downtime.join(
      broadcast(machineInfo.select(
        col("id").as("_mid"), col("machine_name"), col("location"), col("line"))),
      downtime("id") === col("_mid"), "inner")
      .drop("_mid")
      .select("id", "tag", "value", "quality", "timestamp",
        "duration_seconds", "duration_minutes", "duration_hours",
        "machine_name", "location", "line")

  /**
   * Reliability KPIs per machine from closed status segments (the
   * dashboard numbers the reference computes client-side from its
   * downtime export — create-quicksight.ts visual family): MTTR =
   * mean DOWN-segment duration, MTBF = total non-DOWN time per
   * failure. Input is [[durations]] output; the trailing open segment
   * is already excluded there, so both sides of every ratio are
   * closed-interval sums.
   *
   * Determinism note: `duration_seconds` is integer-valued (epoch-s
   * differences), so the double sums are exact in any partition
   * order, and the final divisions are single IEEE ops on exact
   * integers — engine-portable. Machines with zero DOWN segments are
   * emitted with NULL mttr/mtbf (no failures ⇒ undefined, matching
   * SQL's NULL-on-no-rows aggregation semantics via null-safe when).
   */
  def reliability(durationsDf: DataFrame, downValue: String = "DOWN"): DataFrame =
    durationsDf
      .groupBy(col("id").as("machineId"))
      .agg(
        sum(when(col("value") === downValue, 1L).otherwise(0L)).as("n_down"),
        sum(when(col("value") === downValue, col("duration_seconds"))
          .otherwise(lit(0.0))).as("_down_s"),
        sum(when(col("value") =!= downValue, col("duration_seconds"))
          .otherwise(lit(0.0))).as("_up_s"))
      .select(
        col("machineId"), col("n_down"),
        when(col("n_down") > 0, col("_down_s") / col("n_down")).as("mttr_seconds"),
        when(col("n_down") > 0, col("_up_s") / col("n_down")).as("mtbf_seconds"))
}
