package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def facts = Seq(
    // (event, key, ts)
    ("e1", "m1", 100L), // == interval start: IN
    ("e2", "m1", 199L), // last instant of [100,200): IN
    ("e3", "m1", 200L), // == end (half-open): OUT
    ("e4", "m1", 5000L), // inside the long interval
    ("e5", "m2", 150L), // right ts, wrong key: OUT
    ("e6", "m1", 99L) // just before start: OUT
  ).toDF("event", "key", "ts")

  private def intervals = Seq(
    ("m1", "short", 100L, 200L), // within one bucket
    ("m1", "long", 4000L, 9000L), // spans multiple 1000-wide buckets
    ("m1", "empty", 150L, 150L), // empty: dropped
    ("m1", "overlap", 150L, 250L) // overlaps "short": e2 matches both
  ).toDF("key2", "name", "start", "end")

  test("containment semantics: half-open [start, end), key-matched, overlap-duplicated") {
    val out = RangeJoin.bucketed(facts, "key", "ts", intervals, "key2", "start", "end", 1000L)
      .select($"event", $"name").as[(String, String)].collect().toSet
    assert(out == Set(
      ("e1", "short"), ("e2", "short"), ("e2", "overlap"), ("e3", "overlap"),
      ("e4", "long")))
  }

  test("a fact never matches the same interval twice (bucket uniqueness)") {
    val out = RangeJoin.bucketed(facts, "key", "ts", intervals, "key2", "start", "end", 50L)
    assert(out.groupBy($"event", $"name").count().filter($"count" > 1).isEmpty)
  }

  test("result is invariant to bucket width") {
    def run(w: Long) =
      RangeJoin.bucketed(facts, "key", "ts", intervals, "key2", "start", "end", w)
        .select($"event", $"name").as[(String, String)].collect().toSet
    assert(run(1L) == run(1000L) && run(7L) == run(1000L) && run(100000L) == run(1000L))
  }

  test("plans as an equi join: no cartesian / nested-loop node") {
    val plan = RangeJoin.bucketed(facts, "key", "ts", intervals, "key2", "start", "end", 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
