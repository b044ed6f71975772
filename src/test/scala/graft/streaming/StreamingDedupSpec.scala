package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming exact dedup: duplicates suppressed within the horizon, state watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val out = StreamingDedup.dedupStream(stream, "ts", md5(col("text")), "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: a, b, and an in-batch duplicate of a
    input.addData((ts(0), "doc a"), (ts(1), "doc b"), (ts(2), "doc a"))
    query.processAllAvailable()
    // batch 2: cross-batch duplicate of b within horizon + new c
    input.addData((ts(3), "doc b"), (ts(4), "doc c"))
    query.processAllAvailable()
    query.stop()

    val kept = spark.table("dedup_out").select("text").as[String].collect().toSeq
    assert(kept.sorted == Seq("doc a", "doc b", "doc c"))
  }
}
