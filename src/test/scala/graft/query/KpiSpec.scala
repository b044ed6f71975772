package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KpiSpec extends SparkTestBase {

  import spark.implicits._

  /** Hand-built two-line telemetry fixture with known OEE factors. */
  private def fixture(): DataFrame = {
    // line0/m1: UP@0 DOWN@60 UP@120 UP@180, counter 0→30 monotone
    // line1/m2: UP@0 IDLE@60 UP@120 UP@180, counter rolls over (0,10,3,8)
    val rows = Seq(
      ("s0/a0/line0/m1", 0L, "UP", 0L), ("s0/a0/line0/m1", 60L, "DOWN", 10L),
      ("s0/a0/line0/m1", 120L, "UP", 20L), ("s0/a0/line0/m1", 180L, "UP", 30L),
      ("s0/a0/line1/m2", 0L, "UP", 0L), ("s0/a0/line1/m2", 60L, "IDLE", 10L),
      ("s0/a0/line1/m2", 120L, "UP", 3L), ("s0/a0/line1/m2", 180L, "UP", 8L))
    rows.toDF("machineId", "es", "status", "cnt")
      .withColumn("ts_us", col("es") * 1000000L)
      .withColumn("timestamp", timestamp_seconds(col("es")))
      .withColumn("quality", lit("GOOD"))
      .withColumn("event_id", col("es"))
  }

  test("OEE: availability x performance x quality per line (hand-checked)") {
    val out = Kpi.oee(fixture())
      .select("lineId", "availability", "performance", "quality_rate", "oee")
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    // line0: closed UP 60 + DOWN 60 => availability 0.5; prod 30 (best) => perf 1.0
    // line1: closed UP 60 + IDLE 60 => availability 1.0; prod 10 banked + 8 = 18 => 0.6
    assert(out === Seq(
      ("line0", 0.5, 1.0, 1.0, 0.5),
      ("line1", 1.0, 0.6, 1.0, 0.6)))
  }

  test("downtime Pareto: rank, cumulative share, vital-few flag") {
    val series = Seq(
      ("A", 0L, "DOWN"), ("A", 100L, "UP"),
      ("B", 0L, "DOWN"), ("B", 300L, "UP"),
      ("C", 0L, "DOWN"), ("C", 100L, "UP"))
      .toDF("id", "es", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"), timestamp_seconds(col("es")).as("timestamp"))
    val out = Kpi.downtimePareto(Downtime.durations(series))
      .select("machineId", "down_seconds", "pareto_rank", "cum_frac", "vital_few")
      .as[(String, Double, Long, Double, Int)].collect().sortBy(_._3).toSeq
    // B 300s (cum .6), A 100s (cum .8, ties with C broken by id), C 100s (cum 1.0)
    assert(out === Seq(
      ("B", 300.0, 1L, 0.6, 1),
      ("A", 100.0, 2L, 0.8, 1),
      ("C", 100.0, 3L, 1.0, 0)))
  }

  test("Pareto is invariant to input partitioning (two-pass rank determinism)") {
    val series = fixture().select(
      col("machineId").as("id"), lit("status").as("tag"), col("status").as("value"),
      col("quality"), col("timestamp"))
    def run(parts: Int): Seq[(String, Double, Long, Double, Int)] =
      Kpi.downtimePareto(Downtime.durations(series.repartition(parts)))
        .select("machineId", "down_seconds", "pareto_rank", "cum_frac", "vital_few")
        .as[(String, Double, Long, Double, Int)].collect().sortBy(_._3).toSeq
    assert(run(1) === run(7))
  }

  test("shift rollup: per (line, shift) counts and production span") {
    // shift boundaries at 0 / 28800 / 57600 seconds-of-day
    val rows = Seq(
      ("s0/a0/line0/m1", 0L, "UP", 0L), ("s0/a0/line0/m1", 100L, "DOWN", 5L),
      ("s0/a0/line0/m1", 30000L, "UP", 9L),
      ("s0/a0/line0/m9", 50L, "UP", 2L),
      ("s0/a0/line1/m2", 60000L, "UP", 1L))
      .toDF("machineId", "es", "status", "cnt")
    val out = Kpi.shiftRollup(rows)
      .select("lineId", "shift", "n_events", "n_down_events", "n_machines", "prod_span")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      ("line0", 0L, 3L, 1L, 2L, 5L), // m1 span 5, m9 span 0
      ("line0", 1L, 1L, 0L, 1L, 0L),
      ("line1", 2L, 1L, 0L, 1L, 0L)))
  }

  test("rate anomaly flags the spike, never the steady rate, and skips rollovers") {
    // machine S: 20 alternating increments 9/11 (mean 10, sd ~1), then
    // one +500 spike, then a rollover reset (negative delta) and one
    // more normal increment. machine C: perfectly constant increments
    // (zero variance => no z-score is defined, no rows).
    def cum(deltas: Seq[Long]): Seq[Long] = deltas.scanLeft(0L)(_ + _).tail
    val sDeltas = (0 until 20).map(i => if (i % 2 == 0) 9L else 11L) ++ Seq(500L)
    val sCnt = cum(sDeltas) ++ Seq(5L, 15L) // reset to 5, then +10
    val rows =
      sCnt.zipWithIndex.map { case (c, i) => ("s0/a0/line0/S", i.toLong, c) } ++
        (0 until 30).map(i => ("s0/a0/line0/C", i.toLong, 10L * i))
    val telemetry = rows.toDF("machineId", "es", "cnt")
      .withColumn("ts_us", col("es") * 1000000L)
      .withColumn("event_id", col("es"))
    val out = Kpi.rateAnomaly(telemetry, windowRows = 16, minObs = 8, zThreshold = 3.0)
      .select("machineId", "event_id", "delta", "z_score")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2, t._3)) === Seq(("s0/a0/line0/S", 20L, 500L)))
    assert(out.head._4 > 100.0, s"spike z ${out.head._4}")
  }

  test("rate anomaly trailing stats are partitioning-invariant") {
    val rows = (0 until 60).map(i =>
      ("s0/a0/line0/M", i.toLong, (i.toLong * 10L) + (i % 7)))
    val telemetry = rows.toDF("machineId", "es", "cnt")
      .withColumn("ts_us", col("es") * 1000000L)
      .withColumn("event_id", col("es"))
    def run(parts: Int) =
      Kpi.rateAnomaly(telemetry.repartition(parts), 16, 8, 0.5)
        .select("event_id", "z_score").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(8))
    assert(run(1).nonEmpty)
  }

  test("availability trend splits segments exactly at day boundaries") {
    // UP [0, 86300), DOWN [86300, 86600) -- crosses midnight at 86400;
    // trailing UP@86600 only closes the DOWN segment (open itself)
    val series = Seq(
      ("s0/a0/line0/m1", 0L, "UP"),
      ("s0/a0/line0/m1", 86300L, "DOWN"),
      ("s0/a0/line0/m1", 86600L, "UP"))
      .toDF("id", "es", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"), timestamp_seconds(col("es")).as("timestamp"))
    val out = Kpi.availabilityTrend(Downtime.durations(series))
      .select("lineId", "day", "down_seconds", "total_seconds", "availability")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    // day0: UP 86300 + DOWN 100 of the straddling segment; day1: DOWN 200
    assert(out === Seq(
      ("line0", 0L, 100L, 86400L, 0.998843),
      ("line0", 1L, 200L, 200L, 0.0)))
  }

  test("outage percentiles interpolate over closed DOWN segments per line") {
    // DOWN durations on line0: 10, 20, 30, 40 (each closed by an UP)
    val rows = Seq(10L, 20L, 30L, 40L).zipWithIndex.flatMap { case (dur, i) =>
      val base = i.toLong * 1000L
      Seq((s"s0/a0/line0/m$i", base, "DOWN"), (s"s0/a0/line0/m$i", base + dur, "UP"))
    }
    val series = rows.toDF("id", "es", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"), timestamp_seconds(col("es")).as("timestamp"))
    val out = Kpi.outagePercentiles(Downtime.durations(series))
      .select("lineId", "n_outages", "p50_seconds", "p90_seconds", "max_seconds")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // linear interpolation at index q*(n-1): p50 -> 25.0, p90 -> 37.0
    assert(out === Seq(("line0", 4L, 25.0, 37.0, 40.0)))
  }

  test("gap report flags only above-threshold silences, keeps healthy machines") {
    val rows = Seq(
      ("s0/a0/line0/A", 0L), ("s0/a0/line0/A", 100L), ("s0/a0/line0/A", 100000L),
      ("s0/a0/line0/A", 100200L), ("s0/a0/line0/A", 300000L),
      ("s0/a0/line0/B", 0L), ("s0/a0/line0/B", 10L))
      .toDF("machineId", "es")
      .withColumn("ts_us", col("es") * 1000000L)
      .withColumn("event_id", col("es"))
    val out = Kpi.gapReport(rows, thresholdSeconds = 86400L)
      .select("machineId", "n_readings", "n_gaps", "max_gap_seconds", "gap_seconds_total")
      .as[(String, Long, Long, Option[Long], Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("s0/a0/line0/A", 5L, 2L, Some(199800L), 299700L),
      ("s0/a0/line0/B", 2L, 0L, None, 0L)))
  }

  test("transition matrix counts change-points only, keyed by line") {
    val rows = Seq(
      ("s0/a0/line0/m1", 0L, "UP"), ("s0/a0/line0/m1", 10L, "DOWN"),
      ("s0/a0/line0/m1", 20L, "UP"), ("s0/a0/line0/m1", 30L, "UP"), // run: no transition
      ("s0/a0/line0/m1", 40L, "IDLE"),
      ("s0/a0/line0/m2", 0L, "UP"), ("s0/a0/line0/m2", 10L, "DOWN"))
      .toDF("machineId", "es", "status")
      .withColumn("ts_us", col("es") * 1000000L)
    val out = Kpi.transitionMatrix(rows)
      .select("lineId", "from_status", "to_status", "n_transitions")
      .as[(String, String, String, Long)].collect().sortBy(t => (t._2, t._3)).toSeq
    assert(out === Seq(
      ("line0", "DOWN", "UP", 1L),
      ("line0", "UP", "DOWN", 2L),
      ("line0", "UP", "IDLE", 1L)))
  }

  test("downtime heatmap splits DOWN segments at hour boundaries only") {
    // DOWN [3500, 7300) spans hours 0/1/2 with 100/3600/100 seconds;
    // the UP segment must not appear at all
    val series = Seq(
      ("s0/a0/line0/m1", 0L, "UP"),
      ("s0/a0/line0/m1", 3500L, "DOWN"),
      ("s0/a0/line0/m1", 7300L, "UP"))
      .toDF("id", "es", "value")
      .select(col("id"), lit("status").as("tag"), col("value"),
        lit("GOOD").as("quality"), timestamp_seconds(col("es")).as("timestamp"))
    val out = Kpi.downtimeHeatmap(Downtime.durations(series))
      .select("lineId", "hour_of_day", "down_seconds", "n_segments")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out === Seq(
      ("line0", 0L, 100L, 1L),
      ("line0", 1L, 3600L, 1L),
      ("line0", 2L, 100L, 1L)))
  }
}
