package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkTestBase {
  import spark.implicits._

  test("gap > threshold opens a new session; ≤ threshold continues") {
    val ev = Seq(
      ("m1", 0L, 1L), ("m1", 100L, 2L), ("m1", 350L, 3L), // gaps 100, 250 ≤ 300
      ("m1", 1000L, 4L), // gap 650 > 300 → session 2
      ("m2", 5L, 5L) // other key: own numbering
    ).toDF("key", "ts", "tie")
    val out = Sessions.sessionize(ev, "key", "ts", "tie", gap = 300L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("m1", 1L, 0L, 350L, 3L),
      ("m1", 2L, 1000L, 1000L, 1L),
      ("m2", 1L, 5L, 5L, 1L)))
  }

  test("gap exactly equal to threshold does NOT break the session") {
    val ev = Seq(("m", 0L, 1L), ("m", 300L, 2L)).toDF("key", "ts", "tie")
    val out = Sessions.sessionize(ev, "key", "ts", "tie", gap = 300L).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_events") == 2L)
  }

  test("timestamp ties stay in one session regardless of tie order") {
    val ev = Seq(("m", 10L, 9L), ("m", 10L, 1L), ("m", 10L, 5L)).toDF("key", "ts", "tie")
    val out = Sessions.sessionize(ev, "key", "ts", "tie", gap = 1L).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_events") == 3L)
  }

  test("single shuffle: window and final aggregation share the key partitioning") {
    val ev = Seq(("m", 0L, 1L), ("m", 400L, 2L)).toDF("key", "ts", "tie")
    val plan = Sessions.sessionize(ev, "key", "ts", "tie", gap = 300L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).size -
      "AQEShuffleRead".r.findAllIn(plan).size
    assert(shuffles <= 1, s"expected ≤1 shuffle:\n$plan")
  }
}
