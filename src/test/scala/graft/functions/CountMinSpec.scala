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
}
