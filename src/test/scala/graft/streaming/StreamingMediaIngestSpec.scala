package graft.streaming

import graft.SparkTestBase
import graft.functions.{EmbeddingPipeline, HashProjectionLoader, Multimodal, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingMediaIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val loader = HashProjectionLoader(dimIn = 16, dimOut = 8, seed = 11L)

  private def mediaRows(ids: Range): Seq[Multimodal.MediaRow] =
    ids.map { i =>
      val text = s"stream doc $i body ${"z" * (i % 13)}"
      Multimodal.MediaRow(i.toLong, "image/fake", text.getBytes("UTF-8"),
        text.length % 64 + 1, text.length % 48 + 1)
    }

  test("streamed media is embedded and served identically to the batch pipeline") {
    val path = java.nio.file.Files.createTempDirectory("media-live").toString + "/ix"
    val ckpt = java.nio.file.Files.createTempDirectory("media-ckpt").toString

    // bootstrap from a seed slice of the SAME corpus, embedded in batch
    val all = mediaRows(0 until 120)
    val seed = EmbeddingPipeline.asCorpus(EmbeddingPipeline.embedMedia(
      all.take(60).toDS(), loader))
    StreamingIvfIndex.bootstrap(seed, path, nClusters = 4)

    // stream the remaining media in two micro-batches
    val src = MemoryStream[Multimodal.MediaRow](spark)
    val q = StreamingMediaIngest.attach(src.toDS(), loader, path, ckpt)
    src.addData(all.slice(60, 90): _*)
    q.processAllAvailable()
    src.addData(all.slice(90, 120): _*)
    q.processAllAvailable()
    q.stop()

    val queries = EmbeddingPipeline.asCorpus(EmbeddingPipeline.embedMedia(
      all.take(5).toDS(), loader))
    val live = StreamingIvfIndex.topKIndexed(spark, path, queries, k = 3, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet

    // reference: the whole corpus embedded in ONE batch, same centroids
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val full = EmbeddingPipeline.asCorpus(EmbeddingPipeline.embedMedia(all.toDS(), loader))
    val ref = Similarity.ivfTopKWith(full, queries, k = 3, centroids, nProbe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(live === ref)
    assert(live.nonEmpty)
    // every streamed vector is servable exactly once
    assert(StreamingIvfIndex.servingCorpus(spark, path).count() === 120)
  }
}
