package graft.streaming

import graft.SparkTestBase
import graft.functions.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingIvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, sf)

  test("streamed inserts are served identically to a batch-built index") {
    val path = java.nio.file.Files.createTempDirectory("ivf-live").toString + "/ix"
    val seed = emb.filter(col("vec_id") % 3 === 0)
    StreamingIvfIndex.bootstrap(seed, path)
    val centroids = Similarity.loadIvfCentroids(spark, path)

    // two micro-batches of late-arriving vectors
    StreamingIvfIndex.processBatch(
      emb.filter(col("vec_id") % 3 === 1), centroids, path, batchId = 0L)
    StreamingIvfIndex.processBatch(
      emb.filter(col("vec_id") % 3 === 2), centroids, path, batchId = 1L)

    val queries = emb.filter(col("vec_id") < 10)
    val live = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    // reference: the SAME centroids over the full corpus in one batch
    val ref = Similarity.ivfTopKWith(emb, queries, k = 5, centroids, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(live == ref)
    assert(live.nonEmpty)
  }

  test("at-least-once replay collapses to one copy; compaction preserves serving results") {
    val path = java.nio.file.Files.createTempDirectory("ivf-replay").toString + "/ix"
    StreamingIvfIndex.bootstrap(emb.filter(col("vec_id") < 400), path)
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val late = emb.filter(col("vec_id") >= 400)
    StreamingIvfIndex.processBatch(late, centroids, path, batchId = 5L)
    // crash between append and checkpoint commit: same batch, same id
    StreamingIvfIndex.processBatch(late, centroids, path, batchId = 5L)

    val n = emb.count()
    assert(StreamingIvfIndex.servingCorpus(spark, path).count() == n,
      "replayed rows must collapse to one copy per vector")
    val queries = emb.filter(col("vec_id") < 10)
    val before = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet

    StreamingIvfIndex.compact(spark, path)
    assert(spark.read.parquet(s"$path/corpus").count() == n,
      "compaction must physically drop the duplicates")
    val after = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(after == before)
  }

  test("compaction survives a mid-swap crash; partial stages are never promoted") {
    val path = java.nio.file.Files.createTempDirectory("ivf-crash").toString + "/ix"
    StreamingIvfIndex.bootstrap(emb.filter(col("vec_id") < 400), path)
    val centroids = Similarity.loadIvfCentroids(spark, path)
    StreamingIvfIndex.processBatch(
      emb.filter(col("vec_id") >= 400), centroids, path, batchId = 0L)
    val queries = emb.filter(col("vec_id") < 10)
    val expected = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet

    StreamingIvfIndex.compact(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/corpus")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.compact_tmp_corpus")
    assert(!fs.exists(tmp), "temp stage must be cleaned up on success")

    // crash between delete(live) and rename: the corpus survives ONLY
    // in the complete hidden stage. A re-run must finish the swap.
    assert(fs.rename(live, tmp))
    assert(!fs.exists(live))
    StreamingIvfIndex.compact(spark, path)
    assert(fs.exists(live) && !fs.exists(tmp))
    assert(StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet == expected)

    // a marker-less (mid-write) stage is garbage: discarded, and the
    // intact live corpus recompacted from itself
    fs.mkdirs(tmp)
    val junk = fs.create(new org.apache.hadoop.fs.Path(tmp, "cell=0/part-junk.parquet"), true)
    junk.write("not parquet".getBytes("UTF-8")); junk.close()
    StreamingIvfIndex.compact(spark, path)
    assert(!fs.exists(tmp))
    assert(StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet == expected)
  }

  test("serving scan prunes to probed cell partitions; e2e attach via MemoryStream") {
    val path = java.nio.file.Files.createTempDirectory("ivf-stream").toString + "/ix"
    val checkpoint = java.nio.file.Files.createTempDirectory("ivf-chk").toString
    StreamingIvfIndex.bootstrap(emb.filter(col("vec_id") < 450), path)

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingIvfIndex.attach(
      input.toDF().toDF("vec_id", "embedding"), path, checkpoint)
    try {
      val tail = emb.filter(col("vec_id") >= 450)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      input.addData(tail)
      q.processAllAvailable()
    } finally q.stop()

    val queries = emb.filter(col("vec_id") < 5)
    val served = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 5, nProbe = 2)
    // streamed rows are searchable...
    assert(served.count() > 0)
    // ...and the plan reads only the probed cells (partition pruning)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(1200))
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val ref = Similarity.ivfTopKWith(emb, queries, k = 5, centroids, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served.as[(Long, Long, Double, Int)].collect().toSet == ref)
  }
}
