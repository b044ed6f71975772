package graft.query

import graft.model.MachineStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The UI-tier aggregations made server-side (SURVEY §2.4 A5-A8):
 * the reference computes these client-side in React
 * (web-ui/src/views/), which caps them at dashboard scale; here they
 * are distributed aggregations.
 */
object Rollups {

  /**
   * Line availability (A6, LineRow.tsx:49-52): per line, machines with
   * status UP or IDLE vs total.
   * `machines` columns: lineId, machineStatus.
   */
  def lineAvailability(machines: DataFrame): DataFrame =
    machines.groupBy("lineId").agg(
      sum(when(col("machineStatus").isin(MachineStatus.Up, MachineStatus.Idle), 1L).otherwise(0L))
        .as("available_machines"),
      count(lit(1)).as("total_machines"))

  /**
   * Machines grouped by line within a location (A5,
   * Overview.tsx:325-347): deterministic sorted member list per
   * (location, line).
   * `machines` columns: locationId, lineId, id.
   */
  def machinesByLine(machines: DataFrame): DataFrame =
    machines.groupBy("locationId", "lineId").agg(
      count(lit(1)).as("machine_count"),
      concat_ws(",", array_sort(collect_list(col("id")))).as("machine_ids"))

  /**
   * Total production with counter rollover (A7,
   * MachineDetail.tsx:99-119): scan the per-machine count series in
   * time order tracking a running max; each time the counter drops
   * (reset), the previous max is banked; total = banked + final max.
   *
   * Window formulation: because a drop below the running max banks it
   * and restarts the run, each run is a non-decreasing sequence and the
   * running max always equals the previous value — so rollovers are
   * exactly the rows where `count < lag(count)` and the banked amount
   * is `lag(count)`. total = Σ lag(count) at rollovers + last count.
   * One shuffle on machineId; no driver-side iteration.
   *
   * `counts` columns: machineId, ts (orderable), count (numeric,
   * null rows ignored — the UI skips empty productionCountValue).
   */
  def totalProduction(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("machineId").orderBy(col("ts"), col("count"))
    val nonNull = counts.filter(col("count").isNotNull)
    nonNull
      .withColumn("_prev", lag(col("count"), 1).over(w))
      .groupBy("machineId")
      .agg((coalesce(sum(when(col("count") < col("_prev"), col("_prev"))), lit(0L))
        + max_by(col("count"), struct(col("ts"), col("count")))).as("total_production"))
  }

  /** min/max production for the chart axis (A8, MachineDetail.tsx:150-151). */
  def productionRange(counts: DataFrame): DataFrame =
    counts.filter(col("count").isNotNull).groupBy("machineId")
      .agg(min(col("count")).as("min_count"), max(col("count")).as("max_count"))
}
