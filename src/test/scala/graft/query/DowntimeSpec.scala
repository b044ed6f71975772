package graft.query

import graft.SparkTestBase
import java.sql.Timestamp

class DowntimeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // series m1/status: UP(0) UP(10) DOWN(20) DOWN(30) UP(50); m2/status: DOWN(5)
  private val fixture = Seq(
    ("m1", "status", "UP", "GOOD", ts(0)),
    ("m1", "status", "UP", "GOOD", ts(10)),
    ("m1", "status", "DOWN", "GOOD", ts(20)),
    ("m1", "status", "DOWN", "GOOD", ts(30)),
    ("m1", "status", "UP", "GOOD", ts(50)),
    ("m2", "status", "DOWN", "GOOD", ts(5)))
    .toDF("id", "tag", "value", "quality", "timestamp")

  test("change points keep first row and value changes only") {
    val cp = Downtime.changePoints(fixture)
      .select("id", "value", "timestamp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime / 1000)).toSet
    assert(cp == Set(("m1", "UP", 0L), ("m1", "DOWN", 20L), ("m1", "UP", 50L), ("m2", "DOWN", 5L)))
  }

  test("durations run change-point to change-point; open segments dropped") {
    val d = Downtime.durations(fixture)
      .select("id", "value", "duration_seconds").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // m1: UP 0→20 (20s), DOWN 20→50 (30s); trailing UP open → dropped; m2 single open → dropped
    assert(d == Set(("m1", "UP", 20.0), ("m1", "DOWN", 30.0)))
  }

  test("downtime join + enrichment selects DOWN segments with dims") {
    val decode = Seq(("m1", "status", "DOWN")).toDF("id", "status_tag", "down_value")
    val info = Seq(("m1", "Machine One", "site/area", "line1"))
      .toDF("id", "machine_name", "location", "line")
    val out = Downtime.enrich(
      Downtime.downtimeSegments(Downtime.durations(fixture), decode), info)
      .select("id", "value", "duration_seconds", "machine_name", "location", "line")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(("m1", "DOWN", 30.0, "Machine One", "site/area", "line1")))
  }

  test("multi-value down decode table matches any listed value") {
    val events = Seq(
      ("m1", "status", "500", "GOOD", ts(0)),
      ("m1", "status", "u", "GOOD", ts(60)))
      .toDF("id", "tag", "value", "quality", "timestamp")
    val configs = Seq(("m1", "status", "d, false, False, 500"))
      .toDF("machineId", "statusTag", "statusDownValues")
    val decode = Dimensions.machineConfigInformation(configs)
    assert(decode.count() == 4)
    val segs = Downtime.downtimeSegments(Downtime.durations(events), decode)
      .select("value", "duration_seconds").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(segs == Seq(("500", 60.0)))
  }
}
