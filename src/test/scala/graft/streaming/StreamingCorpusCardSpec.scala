package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingCorpusCardSpec extends SparkTestBase {
  import spark.implicits._

  // mixed corpus: long keepers, short droppers, one exact-dup pair per source
  private def docs: Seq[(Long, String, String)] = {
    val long = "the quick brown fox jumps over it and all of " * 6
    (1 to 30).map { i =>
      val text = if (i % 3 == 0) "short doc" else long + s" tail$i"
      (i.toLong, s"s${i % 2}", text)
    } ++ Seq((101L, "s0", long + " tail2"), (102L, "s1", long + " tail3"))
  }

  test("streamed card equals the batch aggregation; replays don't inflate counts") {
    val dir = Files.createTempDirectory("corpus-card").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingCorpusCard.attach(
      input.toDF().toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", s"$dir/signals", s"$dir/ckpt")
    val (a, b) = docs.splitAt(13)
    try {
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      // at-least-once replay of the second half
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val got = StreamingCorpusCard.card(spark, s"$dir/signals", "doc_id", "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

    // batch reference: identical aggregation over the full corpus
    val df = docs.toDF("doc_id", "source", "text")
    val expected = StreamingCorpusCard.signals(df, "doc_id", "source", "text")
      .join(
        StreamingCorpusCard.signals(df, "doc_id", "source", "text")
          .groupBy("source", "digest").agg(count(lit(1)).as("_dn")),
        Seq("source", "digest"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("_dn") > 1, 1L).otherwise(0L)).as("n_exact_dup_docs"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // fixture sanity: both sources saw an exact-dup pair and some drops
    got.foreach { case (_, nDocs, _, _, nKeep, nDup) =>
      assert(nDocs === 16L); assert(nDup >= 2L); assert(nKeep < nDocs)
    }
  }
}
