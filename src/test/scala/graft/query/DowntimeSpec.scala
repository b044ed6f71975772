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

  test("reliability: MTTR/MTBF from closed segments; no-failure machines get NULL KPIs") {
    // m3 has two DOWN segments with an UP run between and after:
    // UP(0..10) DOWN(10..25) UP(25..40) DOWN(40..42) UP(42..50) IDLE(50..)
    val f = Seq(
      ("m3", "status", "UP", "GOOD", ts(0)),
      ("m3", "status", "DOWN", "GOOD", ts(10)),
      ("m3", "status", "UP", "GOOD", ts(25)),
      ("m3", "status", "DOWN", "GOOD", ts(40)),
      ("m3", "status", "UP", "GOOD", ts(42)),
      ("m3", "status", "IDLE", "GOOD", ts(50)),
      // m4 never goes DOWN: closed UP segment only
      ("m4", "status", "UP", "GOOD", ts(0)),
      ("m4", "status", "IDLE", "GOOD", ts(30)),
      ("m4", "status", "UP", "GOOD", ts(60)))
      .toDF("id", "tag", "value", "quality", "timestamp")
    val out = Downtime.reliability(Downtime.durations(f))
      .collect().map(r => (r.getString(0),
        r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    // m3: DOWN segs 15s + 2s → MTTR 8.5; non-DOWN closed 10+15+8=33 → MTBF 16.5
    // m4: closed UP(30)+IDLE(30), zero DOWN → NULL KPIs
    assert(out == Set(
      ("m3", 2L, Some(8.5), Some(16.5)),
      ("m4", 0L, None, None)))
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
