package graft.query

import graft.functions.GlobalRank
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
   *    over the per-machine status change-point segments.
   *  - performance: the line's rollover-corrected production total
   *    (same banking rule as [[Rollups.totalProduction]]) relative to
   *    the best line — a rate-vs-demonstrated-best normalization (no
   *    nameplate capacity exists in the schema).
   *  - quality: fraction of readings flagged GOOD.
   *
   * SINGLE-PASS formulation: all three factors fold out of ONE scan
   * and ONE machine-keyed shuffle. Closed-segment sums use the row-gap
   * identity — the gap to the next observation belongs to the current
   * observation's status, and summing gaps by status equals summing
   * change-point segment durations, PROVIDED gaps at/after the last
   * change point are excluded (they belong to the still-open segment,
   * which the batch semantics drop). That guard is the
   * `_rn < _last_cp_rn` filter, sequence-ordered so timestamp ties
   * can't leak open-segment time in. The per-machine groupBy reuses
   * the window's hash partitioning (no second shuffle); line and best
   * aggregates are plant-layout-sized; the normalizer is a 1-row
   * broadcast.
   *
   * All ratios divide exact integer-valued sums, then the OEE product
   * multiplies the three ROUNDED (6 dp) factors and rounds again —
   * single IEEE ops on exact inputs, engine-portable. Lines with no
   * closed status segment yet have undefined availability and are
   * omitted (matching the segment-join formulation the oracle mirrors).
   */
  def oee(telemetry: DataFrame): DataFrame =
    oeeFromAccounting(oeeMachineAccounting(telemetry))

  /** The per-machine OEE accounting (closed-segment DOWN/total
   * seconds via the row-gap identity, rollover-banked production,
   * GOOD/total counts) — see [[oee]] for the semantics. Exposed so an
   * incrementally-maintained store (StreamingOee) can feed the same
   * line rollup. */
  def oeeMachineAccounting(telemetry: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy("machineId").orderBy(col("ts_us"), col("status"))
    val wCnt = Window.partitionBy("machineId").orderBy(col("ts_us"), col("cnt"))
    val wAll = Window.partitionBy("machineId")
    val prevStatus = lag(col("status"), 1).over(wSeq)
    val marked = telemetry
      .select(col("machineId"), col("ts_us"), col("es"), col("status"), col("cnt"), col("quality"))
      .withColumn("_rn", row_number().over(wSeq))
      .withColumn("_gap", (lead(col("es"), 1).over(wSeq) - col("es")).cast("double"))
      .withColumn("_is_cp", prevStatus.isNull || prevStatus =!= col("status"))
      .withColumn("_prev_cnt", lag(col("cnt"), 1).over(wCnt))
    marked
      .withColumn("_last_cp_rn", max(when(col("_is_cp"), col("_rn"))).over(wAll))
      .groupBy(col("machineId"))
      .agg(
        sum(when(col("_rn") < col("_last_cp_rn") && col("status") === "DOWN", col("_gap"))
          .otherwise(0.0)).as("_down"),
        sum(when(col("_rn") < col("_last_cp_rn"), col("_gap")).otherwise(0.0)).as("_tot"),
        (coalesce(sum(when(col("cnt") < col("_prev_cnt"), col("_prev_cnt"))), lit(0L))
          + max_by(col("cnt"), struct(col("ts_us"), col("cnt")))).as("_prod"),
        sum(when(col("quality") === "GOOD", 1L).otherwise(0L)).as("_good"),
        count(lit(1)).as("_n"))
  }

  /** Line-level OEE rollup over [[oeeMachineAccounting]]-shaped rows
   * (columns machineId, _down, _tot, _prod, _good, _n). */
  def oeeFromAccounting(perMachine: DataFrame): DataFrame = {
    val perLine = perMachine
      .groupBy(lineOf(col("machineId")).as("lineId"))
      .agg(sum(col("_down")).as("_down"), sum(col("_tot")).as("_tot"),
        sum(col("_prod")).as("_prod"), sum(col("_good")).as("_good"), sum(col("_n")).as("_n"))
    // best-line normalizer as a window over the LINE-cardinality
    // aggregate (bounded by plant layout — dozens of rows): keeps one
    // lineage, so the events-scale scan+windows run ONCE; a separate
    // agg+broadcast would re-execute the whole pipeline for one max
    perLine
      .withColumn("_best", max(col("_prod")).over(Window.partitionBy()))
      .filter(col("_tot") > 0.0)
      .select(
        col("lineId"),
        round(lit(1.0) - col("_down") / col("_tot"), 6).as("availability"),
        round(col("_prod") / col("_best"), 6).as("performance"),
        round(col("_good") / col("_n"), 6).as("quality_rate"))
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
    val ranked = GlobalRank.withRankAndRunningSum(down,
      Seq(col("down_seconds").desc, col("machineId")), col("down_seconds"),
      "pareto_rank", "_cum")
    // the grand total IS the last prefix sum — read it off the ranked
    // frame (backed by the persisted sorted RDD), so the events-scale
    // durations lineage never re-executes for the normalizer
    val total = ranked.agg(max(col("_cum")).as("_tot"))
    ranked.crossJoin(broadcast(total))
      .select(
        col("machineId"), col("down_seconds"), col("pareto_rank"),
        round(col("_cum") / col("_tot"), 6).as("cum_frac"),
        when(round(col("_cum") / col("_tot"), 6) <= 0.8, 1).otherwise(0).as("vital_few"))
  }

  /**
   * Trailing-window production-rate anomaly detection: per machine,
   * the z-score of each production increment against the PRECEDING
   * `windowRows` increments — the live "this machine just slowed
   * down / spiked" signal a monitoring deployment alerts on.
   *
   * Increments are counter deltas with rollover resets excluded
   * (negative deltas are the a7 banking events, not production).
   * Mean/variance come from trailing count/sum/sum-of-squares —
   * exact integer-valued double sums, so the trailing statistics are
   * independent of partition boundaries — and the z-score is a fixed
   * arithmetic tree over them (single IEEE ops ⇒ engine-portable);
   * the threshold compares the ROUNDED score so engines can't
   * disagree at the boundary. Two window passes over the same
   * machine-keyed partitioning ⇒ ONE shuffle; per-machine sequential
   * scans parallelize across the fleet.
   */
  def rateAnomaly(telemetry: DataFrame, windowRows: Int = 64, minObs: Int = 16,
      zThreshold: Double = 3.0): DataFrame = {
    require(windowRows >= minObs && minObs >= 2,
      s"need windowRows >= minObs >= 2, got $windowRows/$minObs")
    val wCnt = Window.partitionBy("machineId").orderBy(col("ts_us"), col("cnt"))
    val deltas = telemetry
      .select(col("machineId"), col("ts_us"), col("event_id"), col("cnt"))
      .withColumn("delta", (col("cnt") - lag(col("cnt"), 1).over(wCnt)).cast("double"))
      .filter(col("delta") >= 0.0)
    val wTrail = Window.partitionBy("machineId").orderBy(col("ts_us"), col("cnt"))
      .rowsBetween(-windowRows, -1)
    val n = sum(lit(1.0)).over(wTrail)
    val s1 = sum(col("delta")).over(wTrail)
    val s2 = sum(col("delta") * col("delta")).over(wTrail)
    val z = round((col("delta") - col("_s1") / col("_n")) /
      sqrt((col("_s2") - col("_s1") * col("_s1") / col("_n")) / (col("_n") - 1.0)), 6)
    deltas
      .withColumn("_n", n).withColumn("_s1", s1).withColumn("_s2", s2)
      .filter(col("_n") >= minObs.toDouble &&
        (col("_s2") - col("_s1") * col("_s1") / col("_n")) > 0.0)
      .withColumn("z_score", z)
      .filter(abs(col("z_score")) >= zThreshold)
      .select(col("machineId"), col("event_id"), col("delta").cast("long").as("delta"),
        col("_n").cast("long").as("n_window"), col("z_score"))
  }

  /**
   * Daily availability trend per line: closed status segments are
   * split at UTC day boundaries (each segment contributes its exact
   * overlap seconds to every day it spans), then rolled up to
   * (line × day) DOWN/total seconds and the availability ratio — the
   * dashboard's trend chart, computed server-side.
   *
   * The day-split is a map-side `sequence`+`explode` whose fan-out is
   * bounded by segment length in days (telemetry segments are
   * minutes–hours, so ~1); all sums are exact integer seconds; the
   * only shuffles are the segment windows (machine-keyed, inherited
   * from [[Downtime.durations]]) and the final line×day groupBy on a
   * calendar-bounded key space.
   */
  def availabilityTrend(durationsDf: DataFrame, downValue: String = "DOWN"): DataFrame = {
    val day = 86400L
    val segs = durationsDf
      .withColumn("start_s", unix_timestamp(col("timestamp")))
      .select(col("id"), col("start_s"),
        (col("start_s") + col("duration_seconds")).cast("long").as("end_s"), col("value"))
      .filter(col("end_s") > col("start_s"))
    segs
      .withColumn("day", explode(sequence(
        expr("start_s div 86400"), expr("(end_s - 1) div 86400"))))
      .withColumn("overlap_s",
        least(col("end_s"), (col("day") + 1L) * day) -
          greatest(col("start_s"), col("day") * day))
      .groupBy(lineOf(col("id")).as("lineId"), col("day"))
      .agg(
        sum(when(col("value") === downValue, col("overlap_s")).otherwise(0L)).as("down_seconds"),
        sum(col("overlap_s")).as("total_seconds"))
      .withColumn("availability",
        round(lit(1.0) - col("down_seconds").cast("double") / col("total_seconds").cast("double"), 6))
  }

  /**
   * Downtime heatmap: closed DOWN segments split at UTC hour
   * boundaries and rolled up to (line × hour-of-day) — "when do we
   * break" across the calendar, the planner's maintenance-window view.
   * Same exact-overlap machinery as [[availabilityTrend]] at hour
   * granularity; only DOWN segments are exploded (filter BEFORE the
   * fan-out), and the key space is #lines × 24.
   */
  def downtimeHeatmap(durationsDf: DataFrame, downValue: String = "DOWN"): DataFrame = {
    val hour = 3600L
    durationsDf
      .filter(col("value") === downValue)
      .withColumn("start_s", unix_timestamp(col("timestamp")))
      .select(col("id"), col("start_s"),
        (col("start_s") + col("duration_seconds")).cast("long").as("end_s"))
      .filter(col("end_s") > col("start_s"))
      .withColumn("h", explode(sequence(
        expr("start_s div 3600"), expr("(end_s - 1) div 3600"))))
      .select(
        lineOf(col("id")).as("lineId"),
        (col("h") % 24L).as("hour_of_day"),
        (least(col("end_s"), (col("h") + 1L) * hour) -
          greatest(col("start_s"), col("h") * hour)).as("overlap_s"))
      .groupBy(col("lineId"), col("hour_of_day"))
      .agg(
        sum(col("overlap_s")).as("down_seconds"),
        count(lit(1)).as("n_segments"))
  }

  /**
   * Outage-duration percentiles per line (p50/p90/max over closed DOWN
   * segments) — the SLA view: "a typical outage vs a bad one". Exact
   * sort-based percentiles with linear interpolation (this is a
   * report over the line-keyed AGGREGATE population, small enough to
   * sort per group; the sketch tier's approx_percentile is the
   * hot-path variant). Rounded 4dp so the interpolation arithmetic
   * hashes identically cross-engine.
   */
  def outagePercentiles(durationsDf: DataFrame, downValue: String = "DOWN"): DataFrame =
    durationsDf.filter(col("value") === downValue)
      .groupBy(lineOf(col("id")).as("lineId"))
      .agg(
        count(lit(1)).as("n_outages"),
        expr("round(percentile(duration_seconds, 0.5), 4)").as("p50_seconds"),
        expr("round(percentile(duration_seconds, 0.9), 4)").as("p90_seconds"),
        max(col("duration_seconds")).as("max_seconds"))

  /**
   * Sensor-liveness gap report: per machine, silent stretches longer
   * than `thresholdSeconds` between consecutive readings — the data-
   * quality audit behind the reference's TTL-based machine-liveness
   * rule (a machine whose series stops reporting goes stale). Every
   * machine appears, including gap-free ones (an audit that omits the
   * healthy rows can't prove coverage). One window + one agg on the
   * same machine-keyed partitioning — a single shuffle.
   */
  def gapReport(telemetry: DataFrame, thresholdSeconds: Long = 86400L): DataFrame = {
    val w = Window.partitionBy("machineId").orderBy(col("ts_us"), col("event_id"))
    val isGap = col("_gap") > thresholdSeconds
    telemetry
      .select(col("machineId"), col("ts_us"), col("event_id"), col("es"))
      .withColumn("_gap", col("es") - lag(col("es"), 1).over(w))
      .groupBy(col("machineId"))
      .agg(
        count(lit(1)).as("n_readings"),
        sum(when(isGap, 1L).otherwise(0L)).as("n_gaps"),
        max(when(isGap, col("_gap"))).as("max_gap_seconds"),
        sum(when(isGap, col("_gap")).otherwise(0L)).as("gap_seconds_total"))
  }

  /**
   * Status-transition matrix per line: how often each (from → to)
   * status change occurs — the Markov-ish "what follows a DOWN" view
   * maintenance planning reads. Change-point semantics (equal-value
   * runs are not transitions); key space is #lines × |status|².
   */
  def transitionMatrix(telemetry: DataFrame): DataFrame = {
    val w = Window.partitionBy("machineId").orderBy(col("ts_us"), col("status"))
    telemetry
      .select(col("machineId"), col("ts_us"), col("status"))
      .withColumn("_prev", lag(col("status"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= col("status"))
      .groupBy(
        lineOf(col("machineId")).as("lineId"),
        col("_prev").as("from_status"),
        col("status").as("to_status"))
      .agg(count(lit(1)).as("n_transitions"))
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
