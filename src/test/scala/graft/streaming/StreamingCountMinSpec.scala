package graft.streaming

import graft.SparkTestBase
import graft.functions.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingCountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Seq[(String, String)] =
    (0 until 3000).map(i => (s"g${i % 2}", s"item${i % (40 + i % 3)}"))

  private def flatSketch = CountMin.sketch(
      rows.toDF("g", "v"), Seq(col("g")), col("v"), depth = 3, width = 32)
    .as[(String, Int, Long, Long)].collect().toSet

  test("streamed counters roll up to the flat sketch on any split; replays collapse") {
    for (nSplits <- Seq(1, 4)) {
      val batches = rows.grouped(math.max(1, rows.size / nSplits)).toSeq
      val facts = batches.zipWithIndex.map { case (b, i) =>
        StreamingCountMin.batchCounters(b.toDF("g", "v"), Seq("g"), "v", 3, 32, i.toLong)
      }.reduce(_.unionByName(_))
      val streamed = StreamingCountMin.sketch(facts, Seq("g"))
        .as[(String, Int, Long, Long)].collect().toSet
      assert(streamed === flatSketch, s"splits=$nSplits")
      val replayed = StreamingCountMin.sketch(facts.unionByName(facts), Seq("g"))
        .as[(String, Int, Long, Long)].collect().toSet
      assert(replayed === flatSketch, s"splits=$nSplits replay")
    }
  }

  test("e2e: estimates off the streamed store are one-sided vs the true counts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-stream").toString
    val input = MemoryStream[(String, String)]
    val query = StreamingCountMin.attach(
      input.toDF().toDF("g", "v"), Seq("g"), "v", 3, 32, s"$dir/store", s"$dir/ckpt")
    rows.grouped(1000).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    // per-group sketches read back; estimate within group g0
    val g0 = StreamingCountMin.sketch(spark.read.parquet(s"$dir/store"), Seq("g"))
      .filter(col("g") === "g0").drop("g")
    val truth = rows.filter(_._1 == "g0").toDF("g", "v")
      .groupBy(col("v")).agg(count(lit(1)).as("n_true"))
    val est = CountMin.estimate(g0, truth, col("v"), depth = 3, width = 32)
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (v, t, e) => assert(e >= t, s"$v est=$e true=$t") }
  }
}
