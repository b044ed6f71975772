package graft

import graft.model.UiReferenceMapping
import graft.parse.MessageParser
import graft.query.{Dimensions, Downtime, Kpi, MachineDetail, Rollups}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: every operator family from SURVEY.md §2 exposed as a
 * named query over the testdata tables, with a DuckDB oracle for each
 * SQL-expressible one.
 *
 * Conventions shared by query + oracle (engine-portability rules):
 *  - event timestamps are compared at µs/s granularity (DuckDB
 *    truncates parquet ns → µs; Spark reads ns as Long);
 *  - double SUMs round-trip through DECIMAL(18,4) so accumulation
 *    order can't perturb the last ulp, then cast back to DOUBLE;
 *  - "last value" aggregations always carry a deterministic tie-break.
 */
object SparkEntry {

  // ---- shared helpers -----------------------------------------------------

  /** Exact double aggregation: Σ as DECIMAL(18,4), emitted as DOUBLE. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** CTE header providing telemetry + rt views for the DuckDB oracle. */
  private val T = s"WITH telemetry AS (\n${Tables.telemetrySql}\n), rt AS (\n${Tables.realTimeSql}\n)\n"

  // Fixed condensation window: 2024-01-01 00:00:00 → 2024-01-08 00:00:00 UTC.
  private val CondenseStart = 1704067200L
  private val CondenseEnd = 1704672000L
  // Incremental-refresh fixture (a4): the client first loads
  // [start, mid], then refreshes from 10 minutes before mid — the
  // overlap exercises chunk replacement (MachineDetail.tsx:79-91).
  private val CondenseMid = CondenseStart + 302400L       // minute-aligned midpoint
  private val RefreshStart = CondenseMid - 600L
  private val CondenseMachine = "site1/area1/line1/m1"

  /** Per-machine condensation as DuckDB CTEs named `<p>` (+ internals)
   * — the oracle twin of MachineDetail.realTimeMachineData, emitted
   * twice by a4 with different windows. */
  private def condenseOneSql(p: String, machineId: String, startS: Long, endS: Long): String =
    s"""${p}_inrange AS (
       |  SELECT *, GREATEST(((messageTimestamp + 59) // 60) * 60, $startS + 60) AS chunk
       |  FROM rt
       |  WHERE id IN ('STATUS_$machineId', 'PRODUCTION_COUNT_$machineId')
       |    AND messageTimestamp BETWEEN $startS AND $endS),
       |${p}_status_last AS (
       |  SELECT chunk, value FROM ${p}_inrange WHERE starts_with(id, 'STATUS_')
       |  QUALIFY row_number() OVER (PARTITION BY chunk ORDER BY messageTimestamp DESC, value DESC) = 1),
       |${p}_status_down AS (
       |  SELECT chunk, max(CASE WHEN value = 'DOWN' THEN 1 ELSE 0 END) AS anyd
       |  FROM ${p}_inrange WHERE starts_with(id, 'STATUS_') GROUP BY chunk),
       |${p}_prod_last AS (
       |  SELECT chunk, value FROM ${p}_inrange WHERE starts_with(id, 'PRODUCTION_COUNT_')
       |  QUALIFY row_number() OVER (PARTITION BY chunk ORDER BY messageTimestamp DESC, value DESC) = 1),
       |$p AS (
       |  SELECT g.generate_series AS dataAsOfUTCUnixTimestamp,
       |    COALESCE(CASE WHEN sd.anyd = 1 THEN 'DOWN' ELSE sl.value END, 'UNKNOWN') AS statusValue,
       |    COALESCE(pl.value, '') AS productionCountValue
       |  FROM generate_series(${startS + 60}, $endS, 60) g
       |  LEFT JOIN ${p}_status_last sl ON sl.chunk = g.generate_series
       |  LEFT JOIN ${p}_status_down sd ON sd.chunk = g.generate_series
       |  LEFT JOIN ${p}_prod_last pl ON pl.chunk = g.generate_series)""".stripMargin

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
   * reference's `getRealTimeMachineData` over a full month for one
   * machine (SURVEY §3.2). */
  def entry(spark: SparkSession): DataFrame =
    MachineDetail.realTimeMachineData(
      Tables.realTime(spark, "/root/testdata/sf0.001"),
      machineId = "site1/area1/line1/m1",
      startS = 1704067200L, endS = 1706659200L)

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    coreOracles ++ PipelineQueries.oracleSql

  /** Oracles whose SQL embeds data-dependent fitted constants (n3's
   * KMeans centroids) — generated against a concrete sf dir; Verify
   * merges these into oracle_sql.json. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    PipelineQueries.dynamicOracleSql(spark, sfDir)

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-family: TPC-H-style pricing summary (hash agg, partial+final)
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
          count(lit(1)).as("n"))
    }),

    // P7: filter + projection pushdown (range predicate on scan).
    // messageTimestamp is DERIVED so its range can't reach the scan;
    // the equivalent coarse range on the raw ts column — with literals
    // matched to its physical type — is the pushable conjunct (the
    // 100 TB partition-prune + residual-filter pattern).
    // raw ts in [a, b+1) seconds ⟺ es IN [a, b].
    "p7_range_scan" -> ((s, d) => {
      val rt = Tables.realTime(s, d)
      rt.filter(Tables.tsRawRange(rt, CondenseStart, CondenseEnd + 1) &&
          col("id") === "STATUS_site1/area1/line1/m1" &&
          col("messageTimestamp").between(CondenseStart, CondenseEnd))
        .select(col("messageTimestamp"), col("value"), col("event_id"))
    }),

    // Filter pushdown on a date column + aggregation
    "q2_shipdate_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // TPC-H Q6 shape: 3-predicate scan + single scalar aggregate —
    // the canonical predicate-pushdown/codegen showcase (every
    // conjunct reaches the parquet scan; decimal-exact double sum)
    "q6_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q13 shape: outer-join count distribution — customers
    // bucketed by how many orders they have, INCLUDING the zero-order
    // customers only the left join preserves. Two aggregations, the
    // second over the customer-cardinality intermediate.
    "q9_order_count_histogram" -> ((s, d) => {
      val perCustomer = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCustomer.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Multi-join analytics: 3-way join tree + aggregation (Catalyst
    // join reorder / AQE surface)
    "q3_order_revenue" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1995-06-01").cast("timestamp"))
        .groupBy(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("od_epoch"),
          col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // 6-way join: full star traversal (region→nation→customer→orders→
    // lineitem→supplier) with co-located nation keys
    "q5_supplier_volume" -> ((s, d) => {
      Tables.region(s, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // J1: broadcast dimension join
    "j1_broadcast_enrich" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // J2: anti-join (new-machine detection shape)
    "j2_anti_new_machines" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J3: change-point compression (lag window)
    "j3_change_points" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Downtime.changePoints(t)
        .select(col("id"), unix_timestamp(col("timestamp")).as("es"), col("value"), col("event_id"))
    }),

    // J4 + A10: segment durations (lead window + duration arithmetic)
    "j4_segment_durations" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Downtime.durations(t)
        .select(col("id"), unix_timestamp(col("timestamp")).as("es"), col("value"),
          col("duration_seconds"), col("duration_minutes"), col("duration_hours"))
    }),

    // Beyond-reference: reliability KPIs (MTTR / MTBF per machine)
    // from the closed status segments — the dashboard numbers the
    // reference computes client-side from its downtime export. Double
    // sums are exact (integer-valued durations), divisions single
    // IEEE ops ⇒ engine-portable.
    "x9_reliability" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Downtime.reliability(Downtime.durations(t))
    }),

    // X10: OEE per line — availability (status segments) × performance
    // (rollover production vs best line) × quality (GOOD fraction)
    "x10_oee" -> ((s, d) => Kpi.oee(Tables.telemetry(s, d))),

    // X11: downtime Pareto — global rank + cumulative share WITHOUT a
    // single-partition Window (two-pass GlobalRank over the fleet agg)
    "x11_downtime_pareto" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Kpi.downtimePareto(Downtime.durations(t))
    }),

    // X12: calendar-shift rollup (line × 8h shift-of-day)
    "x12_shift_rollup" -> ((s, d) => Kpi.shiftRollup(Tables.telemetry(s, d))),

    // X13: trailing-window production-rate anomalies — z-score of each
    // counter increment vs the preceding 64 (exact integer trailing
    // sums; one machine-keyed shuffle for both window passes)
    "x13_rate_anomaly" -> ((s, d) =>
      Kpi.rateAnomaly(Tables.telemetry(s, d), windowRows = 64, minObs = 16, zThreshold = 3.0)),

    // X14: daily availability trend per line — closed status segments
    // split exactly at UTC day boundaries (map-side sequence+explode),
    // rolled up to line × day
    "x14_availability_trend" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Kpi.availabilityTrend(Downtime.durations(t))
    }),

    // X19: the three longest outages per line with machine attribution
    // — the incident-review list. Per-line rank with a <= k filter, so
    // WindowGroupLimit prunes each line to k before any full sort.
    "x19_top_outages" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      val w = Window.partitionBy("lineId")
        .orderBy(col("duration_seconds").desc, col("machineId"), col("start_s"))
      Downtime.durations(t).filter(col("value") === "DOWN")
        .select(split_part(col("id"), lit("/"), lit(3)).as("lineId"),
          col("id").as("machineId"),
          unix_timestamp(col("timestamp")).as("start_s"),
          col("duration_seconds"))
        .withColumn("outage_rank", row_number().over(w))
        .filter(col("outage_rank") <= 3)
    }),

    // X18: outage-duration percentiles per line (SLA view)
    "x18_outage_percentiles" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Kpi.outagePercentiles(Downtime.durations(t))
    }),

    // X20: outage-duration quantiles from the MERGEABLE log-histogram
    // sketch — the 100 TB path beside x18's exact percentiles: the
    // stored form is per-MACHINE bin counts (≤ ~488 rows each,
    // regardless of outage count), additive-merged to the line before
    // the quantile walk. The oracle computes the line bins FLAT, so
    // the hash match proves sketch mergeability like o10 does for HLL.
    "x20_outage_quantile_sketch" -> ((s, d) => {
      import graft.functions.LogHistogram
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      val segs = Downtime.durations(t).filter(col("value") === "DOWN")
        .select(col("id"), col("duration_seconds").cast("long").as("dur"))
      val perMachine = LogHistogram.sketch(segs, Seq(col("id")), col("dur"))
      val perLine = perMachine
        .groupBy(split_part(col("id"), lit("/"), lit(3)).as("lineId"), col("bin"))
        .agg(sum(col("n")).as("n"))
      LogHistogram.quantiles(perLine, Seq("lineId"), Seq(0.5, 0.9, 0.99))
    }),

    // X16: sensor-liveness gap report — silent stretches beyond a day
    // per machine (the TTL-staleness audit, server-side)
    "x16_gap_report" -> ((s, d) =>
      Kpi.gapReport(Tables.telemetry(s, d), thresholdSeconds = 86400L)),

    // X17: status-transition matrix per line (change-point semantics)
    "x17_transition_matrix" -> ((s, d) =>
      Kpi.transitionMatrix(Tables.telemetry(s, d))),

    // X15: downtime heatmap — closed DOWN segments split at hour
    // boundaries, rolled to line × hour-of-day (maintenance planning)
    "x15_downtime_heatmap" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      Kpi.downtimeHeatmap(Downtime.durations(t))
    }),

    // J5+J6: downtime segments joined to decode + machine-info dims
    "j6_downtime_enriched" -> ((s, d) => {
      val t = Tables.telemetry(s, d).select(
        col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      val machines = t.select(col("id")).distinct()
      val configs = machines.select(
        col("id").as("machineId"), lit("status").as("statusTag"),
        lit("DOWN").as("statusDownValues"))
      val downDecode = Dimensions.machineConfigInformation(configs)
      val machineInfo = Dimensions.machineInformation(
        machines.select(col("id"), lit(null).cast("string").as("name")))
      Downtime.enrich(Downtime.downtimeSegments(Downtime.durations(t), downDecode), machineInfo)
        .select(col("id"), unix_timestamp(col("timestamp")).as("es"),
          col("duration_seconds"), col("machine_name"), col("location"), col("line"))
    }),

    // A1: last status per machine (max_by)
    "a1_last_status" -> ((s, d) => {
      Tables.telemetry(s, d)
        .groupBy(col("machineId"))
        .agg(max_by(col("status"), struct(col("ts_us"), col("status"))).as("last_status"))
    }),

    // A3+A4: interval condensation (the flagship query, all machines)
    "a3_condense" -> ((s, d) => {
      MachineDetail.condenseAll(Tables.realTime(s, d), CondenseStart, CondenseEnd)
    }),

    // A4 incremental: the dashboard's 60-second refresh cycle — prior
    // view over [start, mid], re-condense from 10 min before mid to
    // end, refreshed chunks replace overlapping priors (keep-new),
    // lookback covers the whole window (MachineDetail.tsx:61-96).
    "a4_condense_incremental" -> ((s, d) => {
      val rt = Tables.realTime(s, d)
      val prior = MachineDetail.realTimeMachineData(rt, CondenseMachine, CondenseStart, CondenseMid)
      graft.api.Facade.refreshRealTimeMachineData(rt, CondenseMachine, prior,
        lastChunkTimestamp = RefreshStart, endTimestamp = CondenseEnd, lookbackHours = 168)
    }),

    // A5: machines grouped by line (collect_list)
    "a5_machines_by_line" -> ((s, d) => {
      val machines = Tables.telemetry(s, d).select(col("machineId").as("id")).distinct()
      val info = Dimensions.machineInformation(
        machines.select(col("id"), lit(null).cast("string").as("name")))
        .select(col("id"), col("location").as("locationId"), col("line").as("lineId"))
      Rollups.machinesByLine(info.select(col("locationId"), col("lineId"), col("id")))
    }),

    // A6: line availability rollup over current statuses
    "a6_line_availability" -> ((s, d) => {
      val last = Tables.telemetry(s, d)
        .groupBy(col("machineId"))
        .agg(max_by(col("status"), struct(col("ts_us"), col("status"))).as("machineStatus"))
      val withLine = last.withColumn("lineId",
        Dimensions.tokensAt(col("machineId"), "/", UiReferenceMapping().lineKeys))
      Rollups.lineAvailability(withLine)
    }),

    // A7: total production with counter rollover
    "a7_total_production" -> ((s, d) => {
      Rollups.totalProduction(Tables.telemetry(s, d)
        .select(col("machineId"), col("ts_us").as("ts"), col("cnt").as("count")))
    }),

    // A8: production min/max
    "a8_production_range" -> ((s, d) => {
      Rollups.productionRange(Tables.telemetry(s, d)
        .select(col("machineId"), col("cnt").as("count")))
    }),

    // Beyond-reference: hierarchical rollup (location → line) via
    // GROUPING SETS — the OLAP surface the reference's dashboards
    // compute client-side, one shuffle for all grouping levels
    "x1_hierarchy_rollup" -> ((s, d) => {
      val t = Tables.telemetry(s, d)
        .withColumn("locationId", Dimensions.tokensAt(col("machineId"), "/", UiReferenceMapping().locationKeys))
        .withColumn("lineId", Dimensions.tokensAt(col("machineId"), "/", UiReferenceMapping().lineKeys))
      t.rollup(col("locationId"), col("lineId"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("status") === "DOWN", 1L).otherwise(0L)).as("n_down"))
        .select(
          coalesce(col("locationId"), lit("ALL")).as("locationId"),
          coalesce(col("lineId"), lit("ALL")).as("lineId"),
          col("n_events"), col("n_down"))
    }),

    // Beyond-reference: as-of join — each production reading annotated
    // with the per-minute status in effect at-or-before it (union +
    // ordered carry-forward: one shuffle on the key, no range probe)
    "x2_asof_join" -> ((s, d) => {
      val t = Tables.telemetry(s, d)
      val statusByMin = t
        .groupBy(col("machineId"), expr("(es div 60) * 60 * 1000000").as("sts"))
        .agg(max_by(col("status"), struct(col("ts_us"), col("status"))).as("status"))
      val prod = t.select(col("event_id"), col("machineId"), col("ts_us"), col("cnt"))
      graft.functions.AsofJoin.asof(prod, statusByMin,
        "machineId", "ts_us", "sts", "status", asofCol = "status_asof")
    }),

    // x2 with the telemetry-native match TOLERANCE: a status minute
    // older than 10 minutes reads as NULL ("machine stopped
    // reporting"), not as a stale match. Same one-shuffle plan — the
    // gap test rides after the carry.
    "x8_asof_within" -> ((s, d) => {
      val t = Tables.telemetry(s, d)
      val statusByMin = t
        .groupBy(col("machineId"), expr("(es div 60) * 60 * 1000000").as("sts"))
        .agg(max_by(col("status"), struct(col("ts_us"), col("status"))).as("status"))
      val prod = t.select(col("event_id"), col("machineId"), col("ts_us"), col("cnt"))
      graft.functions.AsofJoin.asofWithin(prod, statusByMin,
        "machineId", "ts_us", "sts", "status",
        maxGap = 600L * 1000000L, asofCol = "status_asof")
    }),

    // Beyond-reference: range (interval-containment) join — telemetry
    // readings inside each DOWN segment, as a bucketized EQUI join
    // (no nested-loop; see functions/RangeJoin.scala for the 100 TB
    // rationale). Aggregated per segment so the contract row is the
    // per-window rollup a maintenance report would show.
    "x3_range_join" -> ((s, d) => {
      val t = Tables.telemetry(s, d)
      val series = t.select(col("machineId").as("id"), lit("status").as("tag"),
        col("status").as("value"), col("quality"), col("timestamp"), col("event_id"))
      val segs = Downtime.durations(series).filter(col("value") === "DOWN")
        .select(col("id").as("seg_id"),
          unix_timestamp(col("timestamp")).as("seg_start"),
          (unix_timestamp(col("timestamp")) + col("duration_seconds").cast("long")).as("seg_end"))
      val facts = t.select(col("event_id"), col("machineId"), col("es"), col("cnt"))
      graft.functions.RangeJoin.bucketed(facts, "machineId", "es",
          segs, "seg_id", "seg_start", "seg_end", bucketWidth = 3600L)
        .groupBy(col("seg_id"), col("seg_start"), col("seg_end"))
        .agg(count(lit(1)).as("n_events"), sum(col("cnt")).as("cnt_sum"))
    }),

    // Beyond-reference: gap-based sessionization (5-minute gap) — one
    // shuffle on the key for flag + running session number + rollup
    "x4_sessionize" -> ((s, d) => {
      graft.query.Sessions.sessionize(Tables.telemetry(s, d),
        "machineId", "es", "event_id", gap = 300L)
    }),

    // Semi-join (EXISTS shape): orders with ≥1 lineitem shipped in
    // 1995, counted by priority — left_semi never duplicates orders
    "q4_semi_join" -> ((s, d) => {
      Tables.orders(s, d).join(
        Tables.lineitem(s, d).filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Beyond-reference: correlated scalar subquery (TPC-H Q17 shape) —
    // lineitems below 20% of their part's average quantity. Catalyst
    // DECORRELATES this into an aggregate + equi-join (no per-row
    // subquery execution — the plan shape that matters at scale).
    // avg() is order-sensitive in floating point, so the threshold is
    // carried as an exact 0.2·sum/count comparison in integer units:
    // 5 · qty · count < sum  ⟺  qty < 0.2 · avg, all in longs.
    "q7_correlated_subquery" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val qty = col("l_quantity").cast("long") // generator emits integral qty
      val perPart = li.groupBy(col("l_partkey").as("_pk"))
        .agg(sum(qty).as("_sumq"), count(lit(1)).as("_nq"))
      li.join(perPart, col("l_partkey") === col("_pk"))
        .filter(qty * 5L * col("_nq") < col("_sumq"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_small"), sum(qty).as("small_qty"))
    }),

    // Beyond-reference: INTERSECT (set semantics) — customers active
    // in both 1995 and 1996. Plans as a distinct + left-semi: one
    // shuffle per side, never a row-multiplying join.
    "o6_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def active(yr: Int) = o.filter(
        col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      active(1995).intersect(active(1996)).orderBy(col("o_custkey"))
    }),

    // Beyond-reference: EXCEPT — customers active in 1995 but gone in
    // 1996 (churn). Distinct + left-anti plan shape.
    "o7_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def active(yr: Int) = o.filter(
        col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      active(1995).except(active(1996)).orderBy(col("o_custkey"))
    }),

    // Beyond-reference: FULL OUTER join — per-user error-day vs
    // purchase-day tallies, keeping users who only ever did one of
    // the two. Nullable sides surface as explicit 0 counts.
    "q8_full_outer" -> ((s, d) => {
      val ev0 = Tables.events(s, d)
      val ev = ev0.withColumn("es", Tables.tsEs(ev0))
      def days(t: String) = ev.filter(col("event_type") === t)
        .groupBy(col("user_id"))
        .agg(countDistinct(expr("es div 86400")).as(s"${t}_days"))
      days("error").withColumnRenamed("user_id", "_ue")
        .join(days("purchase").withColumnRenamed("user_id", "_up"),
          col("_ue") === col("_up"), "full_outer")
        .select(coalesce(col("_ue"), col("_up")).as("user_id"),
          coalesce(col("error_days"), lit(0L)).as("error_days"),
          coalesce(col("purchase_days"), lit(0L)).as("purchase_days"))
    }),

    // Beyond-reference: multi-level CUBE (type × hour) — Spark expands
    // all four grouping levels BEFORE the exchange, so one shuffle
    // serves every level (no per-level re-scan). Sums carried in exact
    // integer micro-units so the double arithmetic is engine-portable.
    "x5_cube" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.withColumn("es", Tables.tsEs(ev))
        .withColumn("hr", expr("(es div 3600) % 24"))
        .withColumn("v_micro", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
        .cube(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_micro")).as("value_micro"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("hr"), lit(-1L)).as("hr"),
          col("n_events"), col("value_micro"))
    }),

    // Beyond-reference: PIVOT (long→wide) as conditional aggregation
    // over an EXPLICIT value list. Spark's .pivot() — even with values
    // given — plans TWO aggregate phases (pre-agg on (key, pivot col),
    // then the pivot agg: two shuffles); the per-value sum(when(...))
    // form is the single-shuffle, partial-agg-before-exchange plan,
    // which is why it's the at-scale pivot discipline.
    "x6_pivot" -> ((s, d) => {
      def slot(v: String) =
        sum(when(col("event_type") === v, col("v_micro"))).as(v)
      Tables.events(s, d)
        .withColumn("cohort", pmod(col("user_id"), lit(16L)))
        .withColumn("v_micro", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
        .groupBy(col("cohort"))
        .agg(slot("click"), slot("error"), slot("purchase"),
          slot("signup"), slot("view"))
    }),

    // Beyond-reference: time-RANGE window frame — trailing-10-minute
    // event count / production sum per machine (RANGE, not ROWS: frame
    // membership by timestamp distance, peers always included). One
    // shuffle on the key; both aggregates share one Window node.
    "x7_trailing_window" -> ((s, d) => {
      val w = Window.partitionBy(col("machineId")).orderBy(col("es"))
        .rangeBetween(-600L, 0L)
      Tables.telemetry(s, d).select(col("event_id"),
        count(lit(1)).over(w).as("n_10min"),
        sum(col("cnt")).over(w).as("cnt_10min"))
    }),

    // A9: config census (machine / series counts)
    "a9_census" -> ((s, d) => {
      Tables.telemetry(s, d).agg(
        countDistinct(col("machineId")).as("n_machines"),
        countDistinct(Dimensions.tokensAt(col("machineId"), "/", UiReferenceMapping().lineKeys)).as("n_lines"),
        count(lit(1)).as("n_events"))
    }),

    // W1: row numbering within a series
    "w1_row_number" -> ((s, d) => {
      Tables.telemetry(s, d).select(col("event_id"),
        row_number().over(
          Window.partitionBy(col("machineId")).orderBy(col("ts_us"), col("event_id"))).as("rn"))
    }),

    // W3: running max (rollover detection primitive)
    "w3_running_max" -> ((s, d) => {
      Tables.telemetry(s, d).select(col("event_id"),
        max(col("cnt")).over(
          Window.partitionBy(col("machineId")).orderBy(col("ts_us"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, 0)).as("running_max"))
    }),

    // O3: deterministic name sort surfaced as a rank — two-pass global
    // rank (range-partitioned sort + zipWithIndex offsets), NOT a
    // global Window.orderBy, which would funnel all rows through one
    // task at scale
    "o3_name_sort_rank" -> ((s, d) => {
      graft.functions.GlobalRank.withGlobalRank(
          Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
          Seq(col("c_name"), col("c_custkey")), "rank_l")
        .select(col("c_custkey"), col("rank_l").cast("int").as("sort_rank"))
    }),

    // O5: distinct (set semantics)
    "o5_distinct_types" -> ((s, d) => {
      Tables.events(s, d).select(col("event_type")).distinct()
    }),

    // O9: Z-order (Morton) clustering key — the multi-dimensional
    // data-layout sort key behind Warehouse-style OPTIMIZE ZORDER
    // rewrites (graft.functions.ZOrder.clusteredWrite). Codegen'd
    // bit-interleave expression; oracle mirrors it with unrolled
    // shift/mask arithmetic.
    "o9_zorder_key" -> ((s, d) => {
      import graft.functions.ZOrder
      Tables.events(s, d)
        .select(col("event_id"),
          ZOrder.bucket(col("user_id"), 0L, 2047L, 10).as("bx"),
          ZOrder.bucket(col("event_id"), 0L, 1048575L, 10).as("by"))
        .withColumn("zkey", ZOrder.key(10, col("bx"), col("by")))
    }),

    // O10: incremental distinct counting — per-shard HLL sketches
    // (the nightly sketch-store build) MERGED per group at read time.
    // Two-level on purpose: the oracle recomputes the registers FLAT,
    // so a hash-match proves merge == recompute (mergeability), not
    // just that one aggregation ran. 1 KiB of state per (group,
    // shard) regardless of input size; linear-counting branch at this
    // cardinality (150 users).
    "o10_hll_distinct_users" -> ((s, d) => {
      import graft.functions.Hll
      val perShard = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("shard", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("shard"))
        .agg(Hll.sketch(col("user_id").cast("string")).as("sk"))
      perShard.groupBy(col("event_type"))
        .agg(Hll.merge(col("sk")).as("sk"))
        .select(col("event_type"), Hll.stats(col("sk")).as("st"))
        .select(col("event_type"), col("st.v").as("v"), col("st.s").as("s"),
          col("st.estimate").as("estimate"))
    }),

    // O11: the raw-estimate branch of the same sketch (cardinality
    // above 2.5·m): distinct doc ids per source, single-level.
    "o11_hll_distinct_docs" -> ((s, d) => {
      import graft.functions.Hll
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(Hll.sketch(col("doc_id").cast("string")).as("sk"))
        .select(col("source"), Hll.stats(col("sk")).as("st"))
        .select(col("source"), col("st.v").as("v"), col("st.s").as("s"),
          col("st.estimate").as("estimate"))
    }),

    // O12: the raw harmonic-estimate branch end-to-end (o10/o11 stay
    // in linear-counting range at test SF): 5000 distinct event ids
    // per half > 2.5·m, so the oracle must reproduce the frozen-
    // numerator IEEE division exactly.
    "o12_hll_raw_branch" -> ((s, d) => {
      import graft.functions.Hll
      Tables.events(s, d)
        .groupBy(pmod(col("event_id"), lit(2)).as("half"))
        .agg(Hll.sketch(col("event_id").cast("string")).as("sk"))
        .select(col("half"), Hll.stats(col("sk")).as("st"))
        .select(col("half"), col("st.v").as("v"), col("st.s").as("s"),
          col("st.estimate").as("estimate"))
    }),

    // O13: KMV (bottom-k / theta) distinct sketch — the set-algebra
    // sibling of o10's HLL: k=64 < the 150-user population so the
    // (k−1)/θ estimator branch actually fires. Sketch rows are plain
    // hashes ranked by a WindowGroupLimit-prunable window.
    "o13_kmv_distinct_users" -> ((s, d) => {
      import graft.functions.Kmv
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id").cast("string").as("uid"))
      val sk = Kmv.sketch(ev, Seq("event_type"), col("uid"), k = 64)
      Kmv.estimate(sk, Seq("event_type"), k = 64)
    }),

    // O14: what HLL cannot do — set algebra on stored sketches:
    // |click ∪ purchase| from the bottom-k of the two sketches'
    // union, |click ∩ purchase| by inclusion-exclusion. One row.
    "o14_kmv_intersection" -> ((s, d) => {
      import graft.functions.Kmv
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull &&
          col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("user_id").cast("string").as("uid"))
      // eager row blocks: the sketch feeds BOTH the per-type estimates
      // and the union merge — at warehouse scale the sketch build
      // dominates and must run once (a real deployment reads the
      // StreamingKmv STORE here instead of recomputing at all); AQE
      // materializes the two branches concurrently, so a lazy cache
      // block would be rebuilt by both (see Stage.eager)
      val sk = graft.functions.Stage.eager(
        Kmv.sketch(ev, Seq("event_type"), col("uid"), k = 64))
      val perType = Kmv.estimate(sk, Seq("event_type"), k = 64)
        .groupBy()
        .agg(
          max(when(col("event_type") === "click", col("estimate"))).as("est_click"),
          max(when(col("event_type") === "purchase", col("estimate"))).as("est_purchase"))
      val union = Kmv.estimate(Kmv.merge(sk, Seq.empty, k = 64), Seq.empty, k = 64)
        .select(col("estimate").as("est_union"))
      perType.crossJoin(union)
        .select(col("est_click"), col("est_purchase"), col("est_union"),
          (col("est_click") + col("est_purchase") - col("est_union"))
            .as("est_intersection"))
    }),

    // S2+P1+P2+F1-F4: full parse path — envelope JSON → base64 → strict
    // config-driven parse → alias split → epoch
    "p1_parse_roundtrip" -> ((s, d) => {
      // fanOut: the synth→base64→JSON-parse chain is map-only, so on a
      // single-split local scan it ran in ONE task (profiled: 3 tasks
      // total, 1.6 s serial); no-op at scale (PipelineQueries.fanOut)
      val t = PipelineQueries.fanOut(Tables.telemetry(s, d))
      val envelope = t.select(col("event_id"),
        base64(to_json(struct(array(struct(
          concat(col("machineId"), lit("/status")).as("name"),
          col("quality").as("quality"),
          concat(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("+00:00")).as("timestamp"),
          col("status").as("value"))).as("messages"))).cast("binary")).as("payload"))
      MessageParser.parseBase64(envelope, col("payload"),
        Seq(graft.model.MessageFormatConfig(id = "DEFAULT")))
        .select(col("event_id"), col("machineId"), col("tag"), col("epoch_s"), col("value"))
    }),

    // P4: CSV-membership status decode with multi-value lists
    "p4_status_decode" -> ((s, d) => {
      val raw = Tables.events(s, d).select(col("event_id"),
        when(col("event_type") === "error", "d")
          .when(col("event_type") === "purchase", "u")
          .when(col("event_type") === "click", "true")
          .when(col("event_type") === "view", "i")
          .otherwise("False").as("value"))
      raw.select(col("event_id"),
        when(MessageParser.csvListContains(lit("u, true,True, 200"), col("value")), "UP")
          .when(MessageParser.csvListContains(lit("d, false, False, 500"), col("value")), "DOWN")
          .when(MessageParser.csvListContains(lit("i"), col("value")), "IDLE")
          .otherwise("UNKNOWN").as("machineStatus"))
    }),

    // P8+F7: batch normalization (convert_parquet row shape)
    "p8_batch_normalize" -> ((s, d) => {
      Tables.telemetry(s, d).select(
        col("event_id"),
        col("machineId").as("id"), lit("status").as("tag"),
        date_format(col("timestamp"), "yyyy/MM/dd HH:mm:ss.SSSSSS").as("timestamp"),
        col("quality"), col("status").as("value"))
    }),

    // F2: JSON field extraction from the props column
    "s2_json_props" -> ((s, d) => {
      Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
    }))

  // ---- oracles ------------------------------------------------------------

  /**
   * Register-exact DuckDB mirror of the HLL sketch queries (o10/o11):
   * the oracle re-derives every register itself — md5 hex-nibble fold
   * to the top 52 digest bits, integer shifts for the index/rank
   * window, `length(bin(w))` for the exact leading-zero rank — and
   * computes the SAME estimate arithmetic as HllSketch.stats: the
   * harmonic sum is an exact BIGINT (registers cap at RankCap so
   * Σ 2^(RankCap−M) ≤ 2^51), the raw estimate is one IEEE division by
   * a frozen numerator literal, and the linear-counting ln appears
   * only as per-V literals computed with this JVM's Math.log (the
   * same Math.log the Spark eval calls). The oracle computes the
   * registers FLAT — so for the two-level o10 a hash match proves
   * sketch mergeability, not just agreement of one aggregation.
   */
  /** DuckDB mirror of Dedup.md5Hash32 (first 8 md5 hex digits as a
   * long) — same construction as PipelineQueries' private helper. */
  private def md5Hash32Sql(e: String): String =
    (1 to 8).map { kk =>
      s"(strpos('0123456789abcdef', substr(md5($e), $kk, 1)) - 1) * ${math.pow(16, 8 - kk).toLong}"
    }.mkString("(", " + ", ")")

  /** KMV oracle CTE prefix: per-event_type bottom-`k` sketch over the
   * hashed user ids — o13 reads the per-group estimates, o14 adds the
   * union/intersection algebra. */
  private def kmvSketchCtes(k: Int, typeFilter: String = "TRUE"): String =
    s"""h AS (
       |  SELECT event_type AS g, ${md5Hash32Sql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events WHERE user_id IS NOT NULL AND $typeFilter
       |  GROUP BY 1, 2),
       |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM h),
       |sk AS (SELECT g, h FROM r WHERE rk <= $k)""".stripMargin

  /** The per-group estimate SELECT over an `agg(g, n_hashes, hmax)`
   * CTE — exact below k, (k−1)/θ at k, both engines bit-identical. */
  private def kmvEstimateSql(k: Int): String =
    s"""CASE WHEN n_hashes < $k THEN CAST(n_hashes AS DOUBLE)
       |     ELSE ${(k - 1).toDouble}::DOUBLE / (CAST(hmax AS DOUBLE) / 4294967296.0::DOUBLE)
       |END""".stripMargin

  private def hllOracleSql(src: String, groupCol: String, valueSql: String,
      extraWhere: String = "TRUE", groupOut: String = null): String = {
    val gOut = Option(groupOut).getOrElse(groupCol)
    import graft.functions.expressions.HllSketch
    val m = HllSketch.M
    val cap = HllSketch.RankCap
    val wMask = (1L << HllSketch.W) - 1L
    // ::DOUBLE on every literal: a bare decimal literal is DECIMAL in
    // DuckDB and would round the last ulp away from the frozen double
    val lnCase = (1 until m).map { v =>
      s"WHEN $v THEN ${m.toDouble * math.log(m.toDouble / v)}::DOUBLE"
    }.mkString(" ")
    val num = HllSketch.AlphaNumerator.toString
    s"""WITH h AS (
       |  SELECT $groupCol AS g, md5(CAST($valueSql AS VARCHAR)) AS hx
       |  FROM $src WHERE $extraWhere),
       |b AS (
       |  SELECT g, list_sum([ (strpos('0123456789abcdef', substring(hx, i, 1)) - 1)::BIGINT
       |                       << (4*(13 - i)) for i in range(1, 14) ]) AS hv
       |  FROM h),
       |reg AS (
       |  SELECT g, hv >> ${52 - HllSketch.P} AS idx,
       |    max(CASE WHEN ((hv >> 2) & $wMask) = 0 THEN $cap
       |             ELSE $cap - length(bin((hv >> 2) & $wMask)) END) AS mr
       |  FROM b GROUP BY 1, 2),
       |agg AS (
       |  SELECT g,
       |    CAST($m - count(*) AS INTEGER) AS v,
       |    CAST(sum(1::BIGINT << ($cap - mr))
       |         + ($m - count(*)) * (1::BIGINT << $cap) AS BIGINT) AS s
       |  FROM reg GROUP BY 1)
       |SELECT g AS $gOut, v, s,
       |  CASE WHEN v > 0 AND $num / CAST(s AS DOUBLE) <= ${HllSketch.LinearThreshold}
       |       THEN CASE v $lnCase END
       |       ELSE $num / CAST(s AS DOUBLE) END AS estimate
       |FROM agg""".stripMargin
  }

  private def coreOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1,2""".stripMargin,

    "p7_range_scan" -> (T +
      s"""SELECT messageTimestamp, value, event_id FROM rt
         |WHERE id = 'STATUS_site1/area1/line1/m1'
         |  AND messageTimestamp BETWEEN $CondenseStart AND $CondenseEnd""".stripMargin),

    "q2_shipdate_filter" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,

    "q9_order_count_histogram" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY 1""".stripMargin,

    "q3_order_revenue" ->
      """SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-06-01'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q5_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "j1_broadcast_enrich" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    "j2_anti_new_machines" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "j3_change_points" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, status AS value, event_id,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry)
        |SELECT id, es, value, event_id FROM series
        |WHERE prev IS NULL OR prev <> value""".stripMargin),

    "j4_segment_durations" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value, event_id,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp)
        |SELECT id, es, value,
        |  CAST(next_es - es AS DOUBLE) AS duration_seconds,
        |  CAST(next_es - es AS DOUBLE)/60 AS duration_minutes,
        |  CAST(next_es - es AS DOUBLE)/60/60 AS duration_hours
        |FROM seg WHERE next_es IS NOT NULL""".stripMargin),

    "x9_reliability" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, value, CAST(next_es - es AS DOUBLE) AS dur
        |  FROM seg WHERE next_es IS NOT NULL),
        |agg AS (
        |  SELECT id AS machineId,
        |    CAST(sum(CASE WHEN value = 'DOWN' THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
        |    sum(CASE WHEN value = 'DOWN' THEN dur ELSE 0 END) AS down_s,
        |    sum(CASE WHEN value <> 'DOWN' THEN dur ELSE 0 END) AS up_s
        |  FROM closed GROUP BY 1)
        |SELECT machineId, n_down,
        |  CASE WHEN n_down > 0 THEN down_s / n_down END AS mttr_seconds,
        |  CASE WHEN n_down > 0 THEN up_s / n_down END AS mtbf_seconds
        |FROM agg""".stripMargin),

    "x10_oee" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, value, CAST(next_es - es AS DOUBLE) AS dur
        |  FROM seg WHERE next_es IS NOT NULL),
        |av AS (
        |  SELECT split_part(id, '/', 3) AS lineId,
        |    round(1.0 - sum(CASE WHEN value = 'DOWN' THEN dur ELSE 0 END) / sum(dur), 6) AS availability
        |  FROM closed GROUP BY 1),
        |seq AS (
        |  SELECT machineId, ts_us, cnt,
        |         lag(cnt) OVER (PARTITION BY machineId ORDER BY ts_us, cnt) AS prev
        |  FROM telemetry),
        |banked AS (
        |  SELECT machineId, COALESCE(SUM(CASE WHEN cnt < prev THEN prev END), 0) AS b
        |  FROM seq GROUP BY machineId),
        |lastv AS (
        |  SELECT machineId, cnt FROM telemetry
        |  QUALIFY row_number() OVER (PARTITION BY machineId ORDER BY ts_us DESC, cnt DESC) = 1),
        |mprod AS (
        |  SELECT b.machineId, b.b + l.cnt AS mp FROM banked b JOIN lastv l USING (machineId)),
        |lprod AS (
        |  SELECT split_part(machineId, '/', 3) AS lineId, CAST(sum(mp) AS BIGINT) AS p
        |  FROM mprod GROUP BY 1),
        |best AS (SELECT max(p) AS bp FROM lprod),
        |perf AS (SELECT lineId, round(p*1.0/bp, 6) AS performance FROM lprod, best),
        |qual AS (
        |  SELECT split_part(machineId, '/', 3) AS lineId,
        |    round(avg(CASE WHEN quality = 'GOOD' THEN 1.0 ELSE 0.0 END), 6) AS quality_rate
        |  FROM telemetry GROUP BY 1)
        |SELECT av.lineId AS lineId, availability, performance, quality_rate,
        |  round(availability * performance * quality_rate, 6) AS oee
        |FROM av JOIN perf USING (lineId) JOIN qual USING (lineId)""".stripMargin),

    "x11_downtime_pareto" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, value, CAST(next_es - es AS DOUBLE) AS dur
        |  FROM seg WHERE next_es IS NOT NULL),
        |down AS (
        |  SELECT id AS machineId, sum(dur) AS down_seconds
        |  FROM closed WHERE value = 'DOWN' GROUP BY 1),
        |tot AS (SELECT sum(down_seconds) AS t FROM down)
        |SELECT machineId, down_seconds,
        |  CAST(row_number() OVER (ORDER BY down_seconds DESC, machineId) AS BIGINT) AS pareto_rank,
        |  round(sum(down_seconds) OVER (ORDER BY down_seconds DESC, machineId
        |    ROWS UNBOUNDED PRECEDING) / t, 6) AS cum_frac,
        |  CASE WHEN round(sum(down_seconds) OVER (ORDER BY down_seconds DESC, machineId
        |    ROWS UNBOUNDED PRECEDING) / t, 6) <= 0.8 THEN 1 ELSE 0 END AS vital_few
        |FROM down, tot""".stripMargin),

    "x12_shift_rollup" -> (T +
      """, pm AS (
        |  SELECT split_part(machineId, '/', 3) AS lineId,
        |    (es % 86400) // 28800 AS shift, machineId,
        |    count(*) AS n,
        |    sum(CASE WHEN status = 'DOWN' THEN 1 ELSE 0 END) AS nd,
        |    max(cnt) - min(cnt) AS span
        |  FROM telemetry GROUP BY 1, 2, 3)
        |SELECT lineId, shift,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(nd) AS BIGINT) AS n_down_events,
        |  count(*) AS n_machines,
        |  CAST(sum(span) AS BIGINT) AS prod_span
        |FROM pm GROUP BY 1, 2""".stripMargin),

    "x13_rate_anomaly" -> (T +
      """, dl AS (
        |  SELECT machineId, ts_us, event_id, cnt,
        |    CAST(cnt - lag(cnt) OVER (PARTITION BY machineId ORDER BY ts_us, cnt) AS DOUBLE) AS delta
        |  FROM telemetry),
        |fl AS (SELECT * FROM dl WHERE delta >= 0),
        |st AS (
        |  SELECT machineId, event_id, delta,
        |    sum(1.0) OVER w AS n,
        |    sum(delta) OVER w AS s1,
        |    sum(delta*delta) OVER w AS s2
        |  FROM fl
        |  WINDOW w AS (PARTITION BY machineId ORDER BY ts_us, cnt
        |    ROWS BETWEEN 64 PRECEDING AND 1 PRECEDING))
        |SELECT machineId, event_id, CAST(delta AS BIGINT) AS delta,
        |  CAST(n AS BIGINT) AS n_window,
        |  round((delta - s1/n)/sqrt((s2 - s1*s1/n)/(n - 1.0)), 6) AS z_score
        |FROM st
        |WHERE n >= 16.0 AND (s2 - s1*s1/n) > 0
        |  AND abs(round((delta - s1/n)/sqrt((s2 - s1*s1/n)/(n - 1.0)), 6)) >= 3.0""".stripMargin),

    "x14_availability_trend" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, value, es AS start_s, next_es AS end_s
        |  FROM seg WHERE next_es IS NOT NULL AND next_es > es),
        |dy AS (
        |  SELECT split_part(id, '/', 3) AS lineId, value, start_s, end_s,
        |    CAST(unnest(generate_series(start_s // 86400, (end_s - 1) // 86400)) AS BIGINT) AS day
        |  FROM closed),
        |ov AS (
        |  SELECT lineId, day, value,
        |    least(end_s, (day + 1) * 86400) - greatest(start_s, day * 86400) AS sec
        |  FROM dy)
        |SELECT lineId, day,
        |  CAST(sum(CASE WHEN value = 'DOWN' THEN sec ELSE 0 END) AS BIGINT) AS down_seconds,
        |  CAST(sum(sec) AS BIGINT) AS total_seconds,
        |  round(1.0 - CAST(sum(CASE WHEN value = 'DOWN' THEN sec ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(sec) AS DOUBLE), 6) AS availability
        |FROM ov GROUP BY 1, 2""".stripMargin),

    "x19_top_outages" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT split_part(id, '/', 3) AS lineId, id AS machineId,
        |    es AS start_s, CAST(next_es - es AS DOUBLE) AS duration_seconds
        |  FROM seg WHERE next_es IS NOT NULL AND value = 'DOWN')
        |SELECT lineId, machineId, start_s, duration_seconds,
        |  CAST(row_number() OVER (PARTITION BY lineId
        |    ORDER BY duration_seconds DESC, machineId, start_s) AS INTEGER) AS outage_rank
        |FROM closed
        |QUALIFY outage_rank <= 3""".stripMargin),

    "x18_outage_percentiles" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, CAST(next_es - es AS DOUBLE) AS dur
        |  FROM seg WHERE next_es IS NOT NULL AND value = 'DOWN')
        |SELECT split_part(id, '/', 3) AS lineId,
        |  count(*) AS n_outages,
        |  round(quantile_cont(dur, 0.5), 4) AS p50_seconds,
        |  round(quantile_cont(dur, 0.9), 4) AS p90_seconds,
        |  max(dur) AS max_seconds
        |FROM closed GROUP BY 1""".stripMargin),

    // x20: same closed-DOWN population as x18, binned with the exact
    // integer log-histogram arithmetic (bit length via length(bin()),
    // integer shifts — no float log), computed FLAT per line; the
    // quantile walk mirrors LogHistogram.quantiles' ⌈q·total⌉ rank
    // with the multiplication forced to DOUBLE so both engines round
    // the same product.
    "x20_outage_quantile_sketch" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT split_part(id, '/', 3) AS lineId, CAST(next_es - es AS BIGINT) AS dur
        |  FROM seg WHERE next_es IS NOT NULL AND value = 'DOWN'),
        |b AS (
        |  SELECT lineId,
        |    CASE WHEN dur < 16 THEN dur
        |         ELSE (length(bin(dur)) - 4)::BIGINT * 8 + (dur >> (length(bin(dur)) - 4)) END AS bin,
        |    count(*) AS n
        |  FROM closed GROUP BY 1, 2),
        |c AS (
        |  SELECT lineId, bin, n,
        |    sum(n) OVER (PARTITION BY lineId ORDER BY bin) AS cum,
        |    sum(n) OVER (PARTITION BY lineId) AS tot
        |  FROM b),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
        |hit AS (
        |  SELECT c.lineId, q.q, min(c.bin) AS bin
        |  FROM c CROSS JOIN q
        |  WHERE c.cum >= CAST(ceil(CAST(c.tot AS DOUBLE) * q.q::DOUBLE) AS BIGINT)
        |  GROUP BY 1, 2)
        |SELECT lineId, q::DOUBLE AS q,
        |  CASE WHEN bin < 16 THEN bin
        |       ELSE (8 + bin % 8) << ((bin // 8) - 1)::INTEGER END AS value
        |FROM hit""".stripMargin),

    "x16_gap_report" -> (T +
      """, g AS (
        |  SELECT machineId,
        |    es - lag(es) OVER (PARTITION BY machineId ORDER BY ts_us, event_id) AS gap
        |  FROM telemetry)
        |SELECT machineId,
        |  count(*) AS n_readings,
        |  CAST(sum(CASE WHEN gap > 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  max(CASE WHEN gap > 86400 THEN gap END) AS max_gap_seconds,
        |  CAST(sum(CASE WHEN gap > 86400 THEN gap ELSE 0 END) AS BIGINT) AS gap_seconds_total
        |FROM g GROUP BY 1""".stripMargin),

    "x17_transition_matrix" -> (T +
      """, s AS (
        |  SELECT machineId, status,
        |    lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry)
        |SELECT split_part(machineId, '/', 3) AS lineId,
        |  prev AS from_status, status AS to_status,
        |  count(*) AS n_transitions
        |FROM s WHERE prev IS NOT NULL AND prev <> status
        |GROUP BY 1, 2, 3""".stripMargin),

    "x15_downtime_heatmap" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |closed AS (
        |  SELECT id, es AS start_s, next_es AS end_s
        |  FROM seg WHERE next_es IS NOT NULL AND next_es > es AND value = 'DOWN'),
        |hr AS (
        |  SELECT split_part(id, '/', 3) AS lineId, start_s, end_s,
        |    CAST(unnest(generate_series(start_s // 3600, (end_s - 1) // 3600)) AS BIGINT) AS h
        |  FROM closed),
        |ov AS (
        |  SELECT lineId, h % 24 AS hour_of_day,
        |    least(end_s, (h + 1) * 3600) - greatest(start_s, h * 3600) AS sec
        |  FROM hr)
        |SELECT lineId, hour_of_day,
        |  CAST(sum(sec) AS BIGINT) AS down_seconds,
        |  count(*) AS n_segments
        |FROM ov GROUP BY 1, 2""".stripMargin),

    "o10_hll_distinct_users" -> hllOracleSql("events", "event_type",
      "user_id", extraWhere = "user_id IS NOT NULL"),

    "o11_hll_distinct_docs" -> hllOracleSql("documents", "source", "doc_id"),

    "o12_hll_raw_branch" -> hllOracleSql("events", "(event_id % 2)", "event_id",
      groupOut = "half"),

    "o13_kmv_distinct_users" ->
      s"""WITH ${kmvSketchCtes(64)},
         |agg AS (SELECT g, count(*) AS n_hashes, max(h) AS hmax FROM sk GROUP BY 1)
         |SELECT g AS event_type, n_hashes, ${kmvEstimateSql(64)} AS estimate
         |FROM agg""".stripMargin,

    "o14_kmv_intersection" ->
      s"""WITH ${kmvSketchCtes(64, "event_type IN ('click', 'purchase')")},
         |agg AS (SELECT g, count(*) AS n_hashes, max(h) AS hmax FROM sk GROUP BY 1),
         |est AS (SELECT g, ${kmvEstimateSql(64)} AS e FROM agg),
         |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rk
         |       FROM (SELECT DISTINCT h FROM sk)),
         |uagg AS (SELECT count(*) AS n_hashes, max(h) AS hmax FROM mr WHERE rk <= 64),
         |uest AS (SELECT ${kmvEstimateSql(64)} AS e FROM uagg)
         |SELECT
         |  (SELECT e FROM est WHERE g = 'click') AS est_click,
         |  (SELECT e FROM est WHERE g = 'purchase') AS est_purchase,
         |  (SELECT e FROM uest) AS est_union,
         |  (SELECT e FROM est WHERE g = 'click') + (SELECT e FROM est WHERE g = 'purchase')
         |    - (SELECT e FROM uest) AS est_intersection""".stripMargin,

    "o9_zorder_key" -> {
      val terms = (0 until 10).flatMap(j => Seq(
        s"((bx // ${1L << j}) % 2) * ${1L << (2 * j)}",
        s"((by // ${1L << j}) % 2) * ${1L << (2 * j + 1)}")).mkString(" + ")
      s"""WITH b AS (
         |  SELECT event_id,
         |    CASE WHEN user_id < 0 THEN 0 WHEN user_id > 2047 THEN 1023
         |         ELSE CAST((user_id * 1024) // 2048 AS BIGINT) END AS bx,
         |    CASE WHEN event_id < 0 THEN 0 WHEN event_id > 1048575 THEN 1023
         |         ELSE CAST((event_id * 1024) // 1048576 AS BIGINT) END AS by
         |  FROM events)
         |SELECT event_id, bx, by, CAST($terms AS BIGINT) AS zkey FROM b""".stripMargin
    },

    "j6_downtime_enriched" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value, event_id,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp)
        |SELECT id, es,
        |  CAST(next_es - es AS DOUBLE) AS duration_seconds,
        |  id AS machine_name,
        |  split_part(id, '/', 1) || '/' || split_part(id, '/', 2) AS location,
        |  split_part(id, '/', 3) AS line
        |FROM seg WHERE next_es IS NOT NULL AND value = 'DOWN'""".stripMargin),

    "a1_last_status" -> (T +
      """SELECT machineId, status AS last_status FROM telemetry
        |QUALIFY row_number() OVER (PARTITION BY machineId ORDER BY ts_us DESC, status DESC) = 1""".stripMargin),

    "a3_condense" -> (T +
      s""", inrange AS (
         |  SELECT *,
         |    CASE WHEN starts_with(id, 'STATUS_') THEN substr(id, 8) ELSE substr(id, 18) END AS mid,
         |    GREATEST(((messageTimestamp + 59) // 60) * 60, $CondenseStart + 60) AS chunk
         |  FROM rt
         |  WHERE messageTimestamp BETWEEN $CondenseStart AND $CondenseEnd),
         |status_last AS (
         |  SELECT mid, chunk, value FROM inrange WHERE starts_with(id, 'STATUS_')
         |  QUALIFY row_number() OVER (PARTITION BY mid, chunk ORDER BY messageTimestamp DESC, value DESC) = 1),
         |status_down AS (
         |  SELECT mid, chunk, max(CASE WHEN value = 'DOWN' THEN 1 ELSE 0 END) AS anyd
         |  FROM inrange WHERE starts_with(id, 'STATUS_') GROUP BY mid, chunk),
         |prod_last AS (
         |  SELECT mid, chunk, value FROM inrange WHERE starts_with(id, 'PRODUCTION_COUNT_')
         |  QUALIFY row_number() OVER (PARTITION BY mid, chunk ORDER BY messageTimestamp DESC, value DESC) = 1),
         |spine AS (
         |  SELECT m.mid, g.generate_series AS chunk_ts
         |  FROM (SELECT DISTINCT mid FROM inrange) m,
         |       generate_series(${CondenseStart + 60}, $CondenseEnd, 60) g)
         |SELECT s.mid AS machineId, s.chunk_ts AS dataAsOfUTCUnixTimestamp,
         |  COALESCE(CASE WHEN sd.anyd = 1 THEN 'DOWN' ELSE sl.value END, 'UNKNOWN') AS statusValue,
         |  COALESCE(pl.value, '') AS productionCountValue
         |FROM spine s
         |LEFT JOIN status_last sl ON sl.mid = s.mid AND sl.chunk = s.chunk_ts
         |LEFT JOIN status_down sd ON sd.mid = s.mid AND sd.chunk = s.chunk_ts
         |LEFT JOIN prod_last pl ON pl.mid = s.mid AND pl.chunk = s.chunk_ts""".stripMargin),

    "a4_condense_incremental" -> (T + ", " +
      condenseOneSql("pri", CondenseMachine, CondenseStart, CondenseMid) + ",\n" +
      condenseOneSql("ref", CondenseMachine, RefreshStart, CondenseEnd) + "\n" +
      s"""SELECT dataAsOfUTCUnixTimestamp, statusValue, productionCountValue FROM pri
         |WHERE dataAsOfUTCUnixTimestamp NOT IN (SELECT dataAsOfUTCUnixTimestamp FROM ref)
         |UNION ALL
         |SELECT dataAsOfUTCUnixTimestamp, statusValue, productionCountValue FROM ref""".stripMargin),

    "x2_asof_join" -> (T +
      """, prod AS (SELECT event_id, machineId, ts_us, cnt FROM telemetry),
        |sm AS (
        |  SELECT machineId, (es // 60) * 60 * 1000000 AS sts, status
        |  FROM telemetry
        |  QUALIFY row_number() OVER (PARTITION BY machineId, (es // 60) * 60
        |    ORDER BY ts_us DESC, status DESC) = 1)
        |SELECT p.event_id, p.machineId, p.ts_us, p.cnt, s.status AS status_asof
        |FROM prod p ASOF LEFT JOIN sm s
        |  ON p.machineId = s.machineId AND p.ts_us >= s.sts""".stripMargin),

    // the ASOF match then the gap test — latest-within-gap equals
    // nearest-within-gap because the as-of match IS the latest
    "x8_asof_within" -> (T +
      """, prod AS (SELECT event_id, machineId, ts_us, cnt FROM telemetry),
        |sm AS (
        |  SELECT machineId, (es // 60) * 60 * 1000000 AS sts, status
        |  FROM telemetry
        |  QUALIFY row_number() OVER (PARTITION BY machineId, (es // 60) * 60
        |    ORDER BY ts_us DESC, status DESC) = 1)
        |SELECT p.event_id, p.machineId, p.ts_us, p.cnt,
        |  CASE WHEN p.ts_us - s.sts <= 600000000 THEN s.status END AS status_asof
        |FROM prod p ASOF LEFT JOIN sm s
        |  ON p.machineId = s.machineId AND p.ts_us >= s.sts""".stripMargin),

    "x3_range_join" -> (T +
      """, series AS (
        |  SELECT machineId AS id, es, ts_us, status AS value, event_id,
        |         lag(status) OVER (PARTITION BY machineId ORDER BY ts_us, status) AS prev
        |  FROM telemetry),
        |cp AS (
        |  SELECT id, es, ts_us, value FROM series WHERE prev IS NULL OR prev <> value),
        |seg AS (
        |  SELECT id, es, value, lead(es) OVER (PARTITION BY id ORDER BY ts_us, value) AS next_es
        |  FROM cp),
        |dseg AS (
        |  SELECT id, es AS seg_start, next_es AS seg_end FROM seg
        |  WHERE value = 'DOWN' AND next_es IS NOT NULL)
        |SELECT d.id AS seg_id, d.seg_start, d.seg_end,
        |  count(*) AS n_events, CAST(sum(f.cnt) AS BIGINT) AS cnt_sum
        |FROM dseg d JOIN telemetry f ON f.machineId = d.id
        |  AND f.es >= d.seg_start AND f.es < d.seg_end
        |GROUP BY 1, 2, 3""".stripMargin),

    "x4_sessionize" -> (T +
      """, seq AS (
        |  SELECT machineId, es, event_id,
        |    CASE WHEN lag(es) OVER (PARTITION BY machineId ORDER BY es, event_id) IS NULL
        |           OR es - lag(es) OVER (PARTITION BY machineId ORDER BY es, event_id) > 300
        |         THEN 1 ELSE 0 END AS brk
        |  FROM telemetry),
        |sess AS (
        |  SELECT machineId, es,
        |    CAST(sum(brk) OVER (PARTITION BY machineId ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM seq)
        |SELECT machineId, session_seq,
        |  min(es) AS session_start, max(es) AS session_end, count(*) AS n_events
        |FROM sess GROUP BY 1, 2""".stripMargin),

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01')
        |GROUP BY 1""".stripMargin,

    "q7_correlated_subquery" ->
      """WITH q AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |p AS (SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sumq, count(*) AS nq
        |      FROM q GROUP BY 1)
        |SELECT l_partkey, count(*) AS n_small, CAST(sum(qty) AS BIGINT) AS small_qty
        |FROM q JOIN p ON l_partkey = pk
        |WHERE qty * 5 * nq < sumq
        |GROUP BY 1""".stripMargin,

    "o6_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin,

    "o7_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin,

    "q8_full_outer" ->
      """WITH e AS (
        |  SELECT user_id, count(DISTINCT epoch_ns(ts) // 1000000000 // 86400) AS error_days
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |p AS (
        |  SELECT user_id, count(DISTINCT epoch_ns(ts) // 1000000000 // 86400) AS purchase_days
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(e.user_id, p.user_id) AS user_id,
        |  coalesce(error_days, 0) AS error_days,
        |  coalesce(purchase_days, 0) AS purchase_days
        |FROM e FULL OUTER JOIN p ON e.user_id = p.user_id""".stripMargin,

    "x5_cube" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hr,
        |         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
        |  FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(hr, -1) AS hr,
        |       count(*) AS n_events,
        |       CAST(sum(v_micro) AS BIGINT) AS value_micro
        |FROM e GROUP BY CUBE (event_type, hr)""".stripMargin,

    "x6_pivot" ->
      """WITH e AS (
        |  SELECT ((user_id % 16) + 16) % 16 AS cohort, event_type,
        |         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
        |  FROM events)
        |SELECT cohort,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN v_micro END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN v_micro END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN v_micro END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN v_micro END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN v_micro END) AS BIGINT) AS view
        |FROM e GROUP BY 1""".stripMargin,

    "x7_trailing_window" -> (T +
      """SELECT event_id,
        |  count(*) OVER w AS n_10min,
        |  CAST(sum(cnt) OVER w AS BIGINT) AS cnt_10min
        |FROM telemetry
        |WINDOW w AS (PARTITION BY machineId ORDER BY es
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin),

    "a5_machines_by_line" -> (T +
      """, m AS (SELECT DISTINCT machineId AS id FROM telemetry)
        |SELECT split_part(id, '/', 1) || '/' || split_part(id, '/', 2) AS locationId,
        |       split_part(id, '/', 3) AS lineId,
        |       count(*) AS machine_count,
        |       string_agg(id, ',' ORDER BY id) AS machine_ids
        |FROM m GROUP BY 1, 2""".stripMargin),

    "a6_line_availability" -> (T +
      """, last AS (
        |  SELECT machineId, status AS machineStatus FROM telemetry
        |  QUALIFY row_number() OVER (PARTITION BY machineId ORDER BY ts_us DESC, status DESC) = 1)
        |SELECT split_part(machineId, '/', 3) AS lineId,
        |  CAST(sum(CASE WHEN machineStatus IN ('UP','IDLE') THEN 1 ELSE 0 END) AS BIGINT) AS available_machines,
        |  count(*) AS total_machines
        |FROM last GROUP BY 1""".stripMargin),

    "a7_total_production" -> (T +
      """, seq AS (
        |  SELECT machineId, ts_us, cnt,
        |         lag(cnt) OVER (PARTITION BY machineId ORDER BY ts_us, cnt) AS prev
        |  FROM telemetry),
        |banked AS (
        |  SELECT machineId, COALESCE(SUM(CASE WHEN cnt < prev THEN prev END), 0) AS b
        |  FROM seq GROUP BY machineId),
        |lastv AS (
        |  SELECT machineId, cnt FROM telemetry
        |  QUALIFY row_number() OVER (PARTITION BY machineId ORDER BY ts_us DESC, cnt DESC) = 1)
        |SELECT b.machineId, CAST(b.b + l.cnt AS BIGINT) AS total_production
        |FROM banked b JOIN lastv l USING (machineId)""".stripMargin),

    "a8_production_range" -> (T +
      """SELECT machineId, min(cnt) AS min_count, max(cnt) AS max_count
        |FROM telemetry GROUP BY 1""".stripMargin),

    "x1_hierarchy_rollup" -> (T +
      """, h AS (
        |  SELECT split_part(machineId, '/', 1) || '/' || split_part(machineId, '/', 2) AS locationId,
        |         split_part(machineId, '/', 3) AS lineId, status
        |  FROM telemetry)
        |SELECT coalesce(locationId, 'ALL') AS locationId,
        |       coalesce(lineId, 'ALL') AS lineId,
        |       count(*) AS n_events,
        |       CAST(sum(CASE WHEN status = 'DOWN' THEN 1 ELSE 0 END) AS BIGINT) AS n_down
        |FROM h GROUP BY ROLLUP (locationId, lineId)""".stripMargin),

    "a9_census" -> (T +
      """SELECT count(DISTINCT machineId) AS n_machines,
        |  count(DISTINCT split_part(machineId, '/', 3)) AS n_lines,
        |  count(*) AS n_events
        |FROM telemetry""".stripMargin),

    "w1_row_number" -> (T +
      """SELECT event_id,
        |  CAST(row_number() OVER (PARTITION BY machineId ORDER BY ts_us, event_id) AS INTEGER) AS rn
        |FROM telemetry""".stripMargin),

    "w3_running_max" -> (T +
      """SELECT event_id,
        |  max(cnt) OVER (PARTITION BY machineId ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
        |FROM telemetry""".stripMargin),

    "o3_name_sort_rank" ->
      """SELECT c_custkey,
        |  CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS INTEGER) AS sort_rank
        |FROM customer""".stripMargin,

    "o5_distinct_types" -> "SELECT DISTINCT event_type FROM events",

    "p1_parse_roundtrip" -> (T +
      """SELECT event_id, machineId, 'status' AS tag, es AS epoch_s, status AS value
        |FROM telemetry""".stripMargin),

    "p4_status_decode" ->
      """SELECT event_id,
        |  CASE
        |    WHEN (CASE event_type WHEN 'error' THEN 'd' WHEN 'purchase' THEN 'u'
        |          WHEN 'click' THEN 'true' WHEN 'view' THEN 'i' ELSE 'False' END)
        |         IN ('u','true','True','200') THEN 'UP'
        |    WHEN (CASE event_type WHEN 'error' THEN 'd' WHEN 'purchase' THEN 'u'
        |          WHEN 'click' THEN 'true' WHEN 'view' THEN 'i' ELSE 'False' END)
        |         IN ('d','false','False','500') THEN 'DOWN'
        |    WHEN (CASE event_type WHEN 'error' THEN 'd' WHEN 'purchase' THEN 'u'
        |          WHEN 'click' THEN 'true' WHEN 'view' THEN 'i' ELSE 'False' END)
        |         IN ('i') THEN 'IDLE'
        |    ELSE 'UNKNOWN' END AS machineStatus
        |FROM events""".stripMargin,

    "p8_batch_normalize" -> (T +
      """SELECT event_id, machineId AS id, 'status' AS tag,
        |  strftime(make_timestamp(ts_us), '%Y/%m/%d %H:%M:%S.%f') AS timestamp,
        |  quality, status AS value
        |FROM telemetry""".stripMargin),

    "s2_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin)
}
