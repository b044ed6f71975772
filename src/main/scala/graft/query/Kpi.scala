package graft.query

import graft.functions.GlobalRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Plant-level KPI rollups over the telemetry stream — the analytics a
 * downtime-monitoring deployment reads off the reference's BI exports
 * (create-quicksight.ts visual family aggregates machine status and
 * production series; the web UI derives per-line summaries client-side
 * in Overview.tsx/LineRow.tsx). Server-side and distributed here:
 *
 *  - [[oee]]: the classic Overall Equipment Effectiveness triple
 *    (availability × performance × quality) per production line.
 *  - [[downtimePareto]]: machines ranked by total downtime with the
 *    cumulative share — the "vital few" 80/20 view.
 *  - [[shiftRollup]]: production/downtime keyed by calendar shift.
 *
 * Every aggregation is a map-side-combinable groupBy on bounded keys
 * (line × shift); the only global ordering (the Pareto rank) uses the
 * two-pass [[GlobalRank]] formulation, never a single-partition
 * Window, and runs over the fleet-sized per-machine aggregate, not the
 * raw events.
 */
object Kpi {

  /** lineId token of the site/area/line/machine id path (a6's key). */
  private def lineOf(id: Column): Column = split_part(id, lit("/"), lit(3))

  /**
   * OEE per line from the telemetry view:
   *
   *  - availability: 1 − (DOWN seconds / total closed-segment seconds)
   *    over the per-machine status change-point segments
   *    ([[Downtime.durations]] — one shuffle on (id, tag)).
   *  - performance: the line's rollover-corrected production total
   *    ([[Rollups.totalProduction]]) relative to the best line — a
   *    rate-vs-demonstrated-best normalization (no nameplate capacity
   *    exists in the schema).
   *  - quality: fraction of readings flagged GOOD.
   *
   * All three ratios divide exact integer-valued sums, then the OEE
   * product multiplies the three ROUNDED (6 dp) factors and rounds
   * again — single IEEE ops on exact inputs, engine-portable.
   * The factor joins are line-cardinality (bounded by plant layout) ⇒
   * broadcast; the max-production normalizer is a 1-row broadcast.
   */
  def oee(telemetry: DataFrame): DataFrame = {
    val series = telemetry.select(
      col("machineId").as("id"), lit("status").as("tag"),
      col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
    val availability = Downtime.durations(series)
      .groupBy(lineOf(col("id")).as("lineId"))
      .agg(
        sum(when(col("value") === "DOWN", col("duration_seconds")).otherwise(0.0)).as("_down"),
        sum(col("duration_seconds")).as("_tot"))
      .select(col("lineId"), round(lit(1.0) - col("_down") / col("_tot"), 6).as("availability"))

    val lineProd = Rollups.totalProduction(
        telemetry.select(col("machineId"), col("ts_us").as("ts"), col("cnt").as("count")))
      .groupBy(lineOf(col("machineId")).as("lineId"))
      .agg(sum(col("total_production")).as("_prod"))
    val best = lineProd.agg(max(col("_prod")).as("_best"))
    val performance = lineProd.crossJoin(broadcast(best))
      .select(col("lineId"), round(col("_prod") / col("_best"), 6).as("performance"))

    val quality = telemetry
      .groupBy(lineOf(col("machineId")).as("lineId"))
      .agg(round(avg(when(col("quality") === "GOOD", 1.0).otherwise(0.0)), 6).as("quality_rate"))

    availability
      .join(performance, Seq("lineId"))
      .join(quality, Seq("lineId"))
      .withColumn("oee", round(col("availability") * col("performance") * col("quality_rate"), 6))
  }

  /**
   * Downtime Pareto: machines by total closed DOWN-segment seconds,
   * descending, with rank, cumulative seconds, cumulative fraction,
   * and the 80%-line "vital few" flag. Input is [[Downtime.durations]]
   * output; the window-free global rank/prefix-sum runs over the
   * per-machine AGGREGATE (fleet-sized), after the one events-scale
   * shuffle of the groupBy.
   */
  def downtimePareto(durationsDf: DataFrame, downValue: String = "DOWN"): DataFrame = {
    val down = durationsDf.filter(col("value") === downValue)
      .groupBy(col("id").as("machineId"))
      .agg(sum(col("duration_seconds")).as("down_seconds"))
    val total = down.agg(sum(col("down_seconds")).as("_tot"))
    GlobalRank.withRankAndRunningSum(down,
        Seq(col("down_seconds").desc, col("machineId")), col("down_seconds"),
        "pareto_rank", "_cum")
      .crossJoin(broadcast(total))
      .select(
        col("machineId"), col("down_seconds"), col("pareto_rank"),
        round(col("_cum") / col("_tot"), 6).as("cum_frac"),
        when(round(col("_cum") / col("_tot"), 6) <= 0.8, 1).otherwise(0).as("vital_few"))
  }

  /**
   * Shift rollup: (line × 8-hour shift-of-day) production span and
   * downtime counts. Two-level aggregation — per (line, shift,
   * machine) first so the production span (max−min counter) is
   * per-machine before summing — both map-side combinable; no windows,
   * no joins. Key space is #lines × 3 shifts.
   */
  def shiftRollup(telemetry: DataFrame): DataFrame =
    telemetry
      .select(
        lineOf(col("machineId")).as("lineId"),
        ((col("es") % 86400L) / 28800L).cast("long").as("shift"),
        col("machineId"), col("status"), col("cnt"))
      .groupBy(col("lineId"), col("shift"), col("machineId"))
      .agg(
        count(lit(1)).as("_n"),
        sum(when(col("status") === "DOWN", 1L).otherwise(0L)).as("_nd"),
        (max(col("cnt")) - min(col("cnt"))).as("_span"))
      .groupBy(col("lineId"), col("shift"))
      .agg(
        sum(col("_n")).as("n_events"),
        sum(col("_nd")).as("n_down_events"),
        count(lit(1)).as("n_machines"),
        sum(col("_span")).as("prod_span"))
}
