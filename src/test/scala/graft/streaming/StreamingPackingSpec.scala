package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StreamingPackingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // (source, doc_id, n_tokens) — bin budget 100 in the tests
    ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), // a3 straddles into bin 1
    ("a", 4L, 150L),                                // oversized doc spans bins
    ("b", 1L, 10L), ("b", 2L, 95L))

  private def batchPositions = {
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.toDF("source", "doc_id", "n_tokens")
      .withColumn("seq_pos", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"source", $"doc_id", $"n_tokens",
        ($"seq_pos" / 100L).cast("long").as("bin"), ($"seq_pos" % 100L).as("bin_offset"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
  }

  test("streaming packing equals the batch prefix-sum across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val query = StreamingPacking.pack(
        input.toDF().toDF("source", "doc_id", "n_tokens"), budget = 100L)
      .writeStream.format("memory").queryName("packed").outputMode("append").start()
    // split mid-source so the cursor must survive state between batches;
    // feed batch 2 out of doc order to exercise the intra-batch sort
    input.addData(("a", 1L, 40L), ("a", 2L, 40L), ("b", 1L, 10L))
    query.processAllAvailable()
    input.addData(("a", 4L, 150L), ("a", 3L, 40L), ("b", 2L, 95L))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("packed")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batchPositions)
    // spot-check the cross-batch cursor: a3 starts at 80 → bin 0 offset 80
    assert(streamed.contains(("a", 3L, 40L, 0L, 80L)))
    // and a4 lands after 120 tokens → bin 1, offset 20
    assert(streamed.contains(("a", 4L, 150L, 1L, 20L)))
  }
}
