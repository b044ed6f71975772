package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // skewed synthetic stream: item k appears ~ 1000/k times
  private val items: Seq[String] =
    (1 to 60).flatMap(k => Seq.fill(1000 / k)(s"item$k"))

  test("estimates are one-sided (est >= true) and exact at ample width") {
    val df = items.toDF("v")
    val truth = df.groupBy(col("v")).agg(count(lit(1)).as("n_true"))
    // undersized width: collisions must only ADD
    val skNarrow = CountMin.sketch(df, Seq.empty, col("v"), depth = 4, width = 8)
    val narrow = CountMin.estimate(skNarrow, truth, col("v"), depth = 4, width = 8)
      .as[(String, Long, Long)].collect()
    narrow.foreach { case (v, t, e) => assert(e >= t, s"$v est=$e true=$t") }
    assert(narrow.exists { case (_, t, e) => e > t },
      "width 8 over 60 items must collide somewhere")
    // ample width: no collisions, exact
    val skWide = CountMin.sketch(df, Seq.empty, col("v"), depth = 4, width = 4096)
    CountMin.estimate(skWide, truth, col("v"), depth = 4, width = 4096)
      .as[(String, Long, Long)].collect()
      .foreach { case (v, t, e) => assert(e === t, s"$v est=$e true=$t") }
  }

  test("sketches merge additively: per-shard union-summed equals the flat sketch") {
    val df = items.zipWithIndex.map { case (v, i) => (v, i % 5) }.toDF("v", "shard")
    val perShard = CountMin.sketch(df, Seq(col("shard")), col("v"), depth = 3, width = 32)
    val merged = perShard.groupBy(col("d"), col("bucket"))
      .agg(sum(col("n")).as("n"))
    val flat = CountMin.sketch(df, Seq.empty, col("v"), depth = 3, width = 32)
    assert(merged.orderBy("d", "bucket").collect().toSeq ===
      flat.orderBy("d", "bucket").collect().toSeq)
  }

  test("absent probes estimate only collision mass; sketch size is depth x width bounded") {
    val df = items.toDF("v")
    val sk = CountMin.sketch(df, Seq.empty, col("v"), depth = 4, width = 64)
    assert(sk.count() <= 4L * 64L)
    val ghost = Seq("never-seen-a", "never-seen-b").toDF("v")
    val est = CountMin.estimate(sk, ghost, col("v"), depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    // one-sided: a missing item's estimate is only whatever collided
    est.values.foreach(e => assert(e >= 0L))
  }

  test("grouped estimate joins within the probe's own group (one-sided per group)") {
    // group g1 holds many copies of the value; g0 holds one. An
    // ungrouped (d,bucket) join would let g0's probe min() over g1's
    // counters too — here the grouped join must keep est >= true IN
    // THE PROBE'S GROUP for every (group, value).
    val df = (Seq.fill(500)(("g1", "hot")) ++ Seq(("g0", "hot")) ++
      items.map(v => ("g0", v))).toDF("g", "v")
    val sk = CountMin.sketch(df, Seq(col("g")), col("v"), depth = 4, width = 64)
    val truth = df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("n_true"))
    val est = CountMin.estimate(sk, truth, col("v"), depth = 4, width = 64,
        groupCols = Seq("g"))
      .as[(String, String, Long, Long)].collect()
    est.foreach { case (g, v, t, e) => assert(e >= t, s"($g,$v) est=$e true=$t") }
    // and the hot value's g1 estimate reflects g1's mass, not g0's single copy
    val hot = est.collect { case ("g1", "hot", t, e) => (t, e) }.head
    assert(hot._1 === 500L && hot._2 >= 500L)
  }

  test("a grouped sketch without groupCols fails loud instead of undercounting") {
    val df = Seq(("g0", "a"), ("g1", "a")).toDF("g", "v")
    val sk = CountMin.sketch(df, Seq(col("g")), col("v"), depth = 2, width = 16)
    val probes = Seq("a").toDF("v")
    val e = intercept[IllegalArgumentException] {
      CountMin.estimate(sk, probes, col("v"), depth = 2, width = 16)
    }
    assert(e.getMessage.contains("groupCols"))
  }
}
