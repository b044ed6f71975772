package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof: latest at-or-before value per key, inclusive at equal ts") {
    val left = Seq((1, 5L, 50), (1, 10L, 100), (1, 25L, 200), (2, 30L, 300))
      .toDF("k", "ts", "v")
    val right = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 99L, "z"))
      .toDF("k", "rts", "s")
    val out = AsofJoin.asof(left, right, "k", "ts", "rts", "s", "s_asof")
      .select("k", "ts", "v", "s_asof")
      .as[(Int, Long, Int, Option[String])].collect().toSet
    assert(out == Set(
      (1, 5L, 50, None),        // before any right row
      (1, 10L, 100, Some("a")), // inclusive: right at the same ts matches
      (1, 25L, 200, Some("b")), // latest at-or-before wins
      (2, 30L, 300, None)))     // key isolation: k=2's right row is later
  }

  test("asof carries all left columns and never drops or duplicates rows") {
    val left = (0 until 100).map(i => (i % 3, i.toLong, s"row$i")).toDF("k", "ts", "payload")
    val right = Seq((0, 10L, "x"), (1, 50L, "y")).toDF("k", "rts", "s")
    val out = AsofJoin.asof(left, right, "k", "ts", "rts", "s")
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "asof_value"))
    assert(out.filter(col("k") === 2 && col("asof_value").isNotNull).count() == 0)
  }

  test("asof NULL contract: a NULL right value propagates, not skipped (DuckDB ASOF parity)") {
    // DuckDB: SELECT l.*, r.s FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.rts
    // matches the LATEST at-or-before right ROW and returns its value —
    // including when that value is NULL. ts=4 must see the ts=3 NULL,
    // not carry "a" forward; ts=6 picks up "b" again.
    val left = Seq((1, 0L), (1, 2L), (1, 4L), (1, 6L)).toDF("k", "ts")
    val right = Seq((1, 1L, Some("a")), (1, 3L, None), (1, 5L, Some("b")))
      .toDF("k", "rts", "s")
    val out = AsofJoin.asof(left, right, "k", "ts", "rts", "s", "s_asof")
      .select("ts", "s_asof").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      0L -> None,      // no match yet (ASOF would emit no row; outer form: NULL)
      2L -> Some("a"),
      4L -> None,      // matched row EXISTS, its value is NULL — must propagate
      6L -> Some("b")))
  }

  test("asofWithin: stale matches null out at the gap; in-gap NULL values still match") {
    val left = Seq((1, 10L, 100), (1, 25L, 200), (1, 300L, 300), (2, 5L, 400))
      .toDF("k", "ts", "v")
    val right = Seq((1, 10L, Some("a")), (1, 22L, None: Option[String]), (2, 1L, Some("z")))
      .toDF("k", "rts", "s")
    val out = AsofJoin.asofWithin(left, right, "k", "ts", "rts", "s",
        maxGap = 20L, asofCol = "s_asof")
      .select("k", "ts", "v", "s_asof")
      .as[(Int, Long, Int, Option[String])].collect().toSet
    assert(out == Set(
      (1, 10L, 100, Some("a")), // gap 0 ≤ 20
      (1, 25L, 200, None), // matched right row at 22 has a NULL VALUE (in gap)
      (1, 300L, 300, None), // latest right (22) is 278 stale → nulled
      (2, 5L, 400, Some("z")))) // gap 4 ≤ 20
    // distinguishing stale-null from value-null: tighten the gap so the
    // ts=25 row's match (rts=22, gap 3) stays while ts=10's (gap 0) stays
    val tight = AsofJoin.asofWithin(left, right, "k", "ts", "rts", "s",
        maxGap = 3L, asofCol = "s_asof")
      .select("ts", "s_asof").as[(Long, Option[String])].collect().toMap
    assert(tight(10L) == Some("a") && tight(25L) == None && tight(300L) == None)
  }

  test("plan: no range probe — single hash partitioning on the key for the window") {
    val left = Seq((1, 5L, 50)).toDF("k", "ts", "v")
    val right = Seq((1, 10L, "a")).toDF("k", "rts", "s")
    val p = AsofJoin.asof(left, right, "k", "ts", "rts", "s")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("Window"), p.take(600))
  }
}
