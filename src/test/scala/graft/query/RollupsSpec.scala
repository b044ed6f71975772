package graft.query

import graft.SparkTestBase

class RollupsSpec extends SparkTestBase {
  import spark.implicits._

  test("rollover total matches the UI fold (MachineDetail.tsx:99-119)") {
    // series 10,11,12,1,1,2,3,4,5: bank 12 at the drop, final max 5 → 17
    val counts = Seq(10L, 11L, 12L, 1L, 1L, 2L, 3L, 4L, 5L).zipWithIndex
      .map { case (c, i) => ("m1", i.toLong, c) }
      .toDF("machineId", "ts", "count")
    val total = Rollups.totalProduction(counts).as[(String, Long)].head()
    assert(total == (("m1", 17L)))
  }

  test("rollover: monotone series = last value; multiple resets bank each run") {
    val data = Seq(
      // monotone: total = 9
      ("mono", Seq(1L, 5L, 9L)),
      // two resets: 10 banked, 7 banked, final 3 → 20
      ("resets", Seq(4L, 10L, 2L, 7L, 1L, 3L)),
      // single value
      ("one", Seq(42L)))
    val df = data.flatMap { case (m, vs) => vs.zipWithIndex.map { case (v, i) => (m, i.toLong, v) } }
      .toDF("machineId", "ts", "count")
    val out = Rollups.totalProduction(df).as[(String, Long)].collect().toMap
    assert(out == Map("mono" -> 9L, "resets" -> 20L, "one" -> 42L))
  }

  test("line availability counts UP and IDLE as available") {
    val machines = Seq(
      ("l1", "UP"), ("l1", "IDLE"), ("l1", "DOWN"), ("l1", "UNKNOWN"), ("l2", "DOWN"))
      .toDF("lineId", "machineStatus")
    val rows = Rollups.lineAvailability(machines).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("l1", 2L, 4L), ("l2", 0L, 1L)))
  }
}
