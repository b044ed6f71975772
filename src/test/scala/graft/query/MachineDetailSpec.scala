package graft.query

import graft.SparkTestBase

/**
 * The key oracle: the reference's condensation golden tests
 * (data-sources/test/machine-detail.spec.ts:159-277).
 */
class MachineDetailSpec extends SparkTestBase {
  import spark.implicits._

  // window: 2021-01-01 11:58:00 → 12:00:00 UTC
  private val start = 1609502280L
  private val end = 1609502400L

  private def rt(rows: Seq[(String, Long, String)]) =
    rows.toDF("id", "messageTimestamp", "value")

  test("2-minute golden fixture: boundary row, DOWN dominance, last count, past-end drop") {
    val statuses = Seq("UP", "UP", "UP", "IDLE", "UP", "UP", "DOWN", "UP", "UP")
      .zipWithIndex.map { case (v, i) => ("STATUS_m/1", end - 90 + i * 10, v) }
    val counts = Seq("10", "11", "12", "1", "1", "2", "3", "4", "5")
      .zipWithIndex.map { case (v, i) => ("PRODUCTION_COUNT_m/1", end - 90 + i * 10, v) } :+
      (("PRODUCTION_COUNT_m/1", end + 10, "6")) // past-end row: dropped
    val out = MachineDetail.realTimeMachineData(rt(statuses ++ counts), "m/1", start, end)
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (end - 60, "IDLE", "1"), // boundary row (ts == chunk end) belongs to the EARLIER chunk
      (end, "DOWN", "5"))) // DOWN is sticky over the later UPs
  }

  test("1-hour empty range yields 60 UNKNOWN/'' chunks") {
    val empty = rt(Seq(("STATUS_m/1", start - 1000, "UP"))) // a row outside the range keeps the machine known
    val hourEnd = start + 3600
    val out = MachineDetail.realTimeMachineData(empty, "m/1", start, hourEnd)
      .as[(Long, String, String)].collect().toSeq
    assert(out.size == 60)
    assert(out.forall { case (_, s, p) => s == "UNKNOWN" && p == "" })
    assert(out.map(_._1) == (1 to 60).map(i => MachineDetail.floorMinute(start) + i * 60L))
  }

  test("rows between start and first chunk end land in the first chunk") {
    // start not on a minute boundary: floor(start) + 60 is the first end
    val s = start + 30 // 11:58:30
    val rows = rt(Seq(("STATUS_m/1", start + 31, "DOWN")))
    val out = MachineDetail.realTimeMachineData(rows, "m/1", s, end)
      .as[(Long, String, String)].collect().toSeq
    assert(out.head == ((start + 60, "DOWN", "")))
  }

  test("condenseAll covers multiple machines independently") {
    val rows = rt(Seq(
      ("STATUS_a/1", end - 30, "UP"),
      ("STATUS_b/2", end - 30, "DOWN")))
    val out = MachineDetail.condenseAll(rows, end - 60, end)
      .as[(String, Long, String, String)].collect().toSet
    assert(out == Set(("a/1", end, "UP", ""), ("b/2", end, "DOWN", "")))
  }
}
