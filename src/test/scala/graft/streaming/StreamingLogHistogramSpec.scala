package graft.streaming

import graft.SparkTestBase
import graft.functions.LogHistogram
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingLogHistogramSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Seq[(String, Long)] =
    (0 until 4000).map(i => (s"g${i % 3}", ((i * 48271L) % 90000L)))

  private def flatSketch = LogHistogram.sketch(
      rows.toDF("g", "v"), Seq(col("g")), col("v"))
    .as[(String, Long, Long)].collect().toSet

  test("streamed facts roll up to the flat batch sketch on any split; replays collapse") {
    for (nSplits <- Seq(1, 4)) {
      val batches = rows.grouped(math.max(1, rows.size / nSplits)).toSeq
      val facts = batches.zipWithIndex.map { case (b, i) =>
        StreamingLogHistogram.batchBins(b.toDF("g", "v"), Seq("g"), "v", i.toLong)
      }.reduce(_.unionByName(_))
      val streamed = StreamingLogHistogram.sketch(facts, Seq("g"))
        .as[(String, Long, Long)].collect().toSet
      assert(streamed === flatSketch, s"splits=$nSplits")
      // at-least-once: duplicating the whole fact table changes nothing
      val replayed = StreamingLogHistogram.sketch(
        facts.unionByName(facts), Seq("g"))
        .as[(String, Long, Long)].collect().toSet
      assert(replayed === flatSketch, s"splits=$nSplits replay")
    }
  }

  test("e2e: quantiles off the streamed store equal quantiles off the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-lh-stream").toString
    val input = MemoryStream[(String, Long)]
    val query = StreamingLogHistogram.attach(
      input.toDF().toDF("g", "v"), Seq("g"), "v", s"$dir/store", s"$dir/ckpt")
    rows.grouped(1500).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    val store = StreamingLogHistogram.sketch(
      spark.read.parquet(s"$dir/store"), Seq("g"))
    val streamedQ = LogHistogram.quantiles(store, Seq("g"), Seq(0.5, 0.99))
      .as[(String, Double, Long)].collect().toSet
    val batchQ = LogHistogram.quantiles(
        LogHistogram.sketch(rows.toDF("g", "v"), Seq(col("g")), col("v")),
        Seq("g"), Seq(0.5, 0.99))
      .as[(String, Double, Long)].collect().toSet
    assert(streamedQ === batchQ)
    assert(streamedQ.nonEmpty)
  }
}
