package graft.streaming

import graft.SparkTestBase
import graft.functions.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // corpus spanning the interesting cases: shared mid-frequency terms,
  // a rare term, a blank doc (dl = 0, counts toward N), exact dup text
  private val corpus = Seq(
    (1L, "alpha zebra beta beta gamma"),
    (2L, "alpha zebra zebra gamma gamma gamma"),
    (3L, "alpha gamma beta delta"),
    (4L, "alpha gamma delta epsilon"),
    (5L, ""),
    (6L, "alpha beta delta epsilon zeta"),
    (7L, "alpha gamma beta delta"), // exact dup of 3's text, distinct id
    (8L, "zeta zeta epsilon"))

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def queries =
    Seq((100L, Seq("zebra", "gamma")), (101L, Seq("zeta"))).toDF("query_id", "terms")

  private def batchTopK(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Int)] =
    Retrieval.bm25TopK(docsDf(rows), "doc_id", "text", queries, "query_id", "terms",
        k = 5, maxDfFrac = 0.6)
      .as[(Long, Long, Long, Int)].collect().toSet

  private def storeTopK(dir: String): Set[(Long, Long, Long, Int)] =
    StreamingRetrieval.topK(spark, dir, queries, "query_id", "terms",
        k = 5, maxDfFrac = 0.6)
      .as[(Long, Long, Long, Int)].collect().toSet

  test("streamed store serves bit-identical rankings to the batch operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sr").toString + "/ix"
    corpus.grouped(3).zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.processBatch(spark, docsDf(b), "doc_id", "text", dir, i.toLong)
    }
    assert(storeTopK(dir) === batchTopK(corpus))
    spark.catalog.clearCache()
  }

  test("at-least-once replay of a batch collapses; compaction is read-invariant") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-rp").toString + "/ix"
    val batches = corpus.grouped(3).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.processBatch(spark, docsDf(b), "doc_id", "text", dir, i.toLong)
    }
    // replay batch 0 (same batch id) — fact identity collapses it
    StreamingRetrieval.processBatch(spark, docsDf(batches.head), "doc_id", "text", dir, 0L)
    val expected = batchTopK(corpus)
    assert(storeTopK(dir) === expected)
    spark.catalog.clearCache()

    StreamingRetrieval.compact(dir)
    assert(storeTopK(dir) === expected, "fold must not change served rankings")
    spark.catalog.clearCache()

    // replay from BELOW the high-water mark after the fold: excluded
    StreamingRetrieval.processBatch(spark, docsDf(batches.head), "doc_id", "text", dir, 0L)
    assert(storeTopK(dir) === expected)
    spark.catalog.clearCache()
  }

  test("blank docs count toward N exactly like the batch operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-bl").toString + "/ix"
    val withBlank = Seq((1L, "alpha beta"), (2L, ""), (3L, "alpha gamma"), (4L, "beta gamma"))
    withBlank.grouped(2).zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.processBatch(spark, docsDf(b), "doc_id", "text", dir, i.toLong)
    }
    val q = Seq((9L, Seq("alpha"))).toDF("query_id", "terms")
    val st = StreamingRetrieval.topK(spark, dir, q, "query_id", "terms", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val bt = Retrieval.bm25TopK(docsDf(withBlank), "doc_id", "text", q,
      "query_id", "terms", k = 5).as[(Long, Long, Long, Int)].collect().toSet
    assert(st === bt)
    spark.catalog.clearCache()
  }

  test("topK survives a fold between plan construction and action (snapshot read)") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-snap").toString + "/ix"
    corpus.grouped(3).zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.processBatch(spark, docsDf(b), "doc_id", "text", dir, i.toLong)
    }
    val expected = batchTopK(corpus)
    // build the served plan FIRST, then fold — the fold deletes every
    // fact file the lazy counters plan had listed; the snapshot read
    // path must still produce the full (fold-invariant) rankings
    val served = StreamingRetrieval.topK(spark, dir, queries, "query_id", "terms",
      k = 5, maxDfFrac = 0.6)
    StreamingRetrieval.compact(dir)
    assert(served.as[(Long, Long, Long, Int)].collect().toSet === expected)
    // and the lazy variant stays available for quiesced readers
    val (tfLazy, _) = StreamingRetrieval.index(dir)
    assert(tfLazy.count() > 0)
    spark.catalog.clearCache()
  }

  test("e2e: attach(compactEvery) maintains the index from a stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-e2e").toString
    val input = MemoryStream[(Long, String)]
    val query = StreamingRetrieval.attach(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/store", s"$dir/ckpt", compactEvery = 2)
    corpus.grouped(2).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    assert(storeTopK(s"$dir/store") === batchTopK(corpus))
    spark.catalog.clearCache()
  }

  test("publishTables: streamed store -> bucketed serve tables, fit-free and identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sr-pub").toString + "/ix"
    corpus.grouped(3).zipWithIndex.foreach { case (b, i) =>
      StreamingRetrieval.processBatch(spark, docsDf(b), "doc_id", "text", dir, i.toLong)
    }
    StreamingRetrieval.publishTables(spark, dir, "srpub_test", buckets = 4)
    val served = Retrieval.bm25TopKFromTables(spark, "srpub_test", queries,
        "query_id", "terms", k = 5, maxDfFrac = 0.6)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(served === batchTopK(corpus))
    assert(served === storeTopK(dir))
    // published stats match the store exactly (blank docs included)
    val st = spark.table("srpub_test_stats").as[(Long, Long)].collect().head
    assert(st._1 === corpus.size.toLong)
    // the serve plan is fit-free: no term-keyed (df) aggregate
    val p = Retrieval.bm25TopKFromStats(spark, "srpub_test", queries,
      "query_id", "terms", k = 5, maxDfFrac = 0.6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("keys=[term#"), p.take(1500))
    // a re-publish after more batches overwrites cleanly (epoch cadence)
    StreamingRetrieval.processBatch(spark,
      docsDf(Seq((9L, "omega zebra"))), "doc_id", "text", dir, 99L)
    StreamingRetrieval.publishTables(spark, dir, "srpub_test", buckets = 4)
    val again = Retrieval.bm25TopKFromTables(spark, "srpub_test", queries,
        "query_id", "terms", k = 5, maxDfFrac = 0.6)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(again === batchTopK(corpus :+ (9L, "omega zebra")))
    Seq("postings", "doclen", "df", "stats")
      .foreach(t => spark.sql(s"DROP TABLE srpub_test_$t"))
    spark.catalog.clearCache()
  }
}
