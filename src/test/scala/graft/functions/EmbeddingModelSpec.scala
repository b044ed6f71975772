package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Shared JVM counters (local-mode executors are threads here) so the
 * spec can observe the per-partition model lifecycle. */
object EmbedCounters {
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxBatchSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { loads.set(0); closes.set(0); maxBatchSeen.set(0) }
}

/** A loader that wraps the reference model with lifecycle/batch
 * instrumentation — stands in for an ONNX session factory. */
final case class CountingLoader(dimIn: Int, dimOut: Int, seed: Long,
    batch: Int) extends EmbeddingModelLoader {
  def load(): EmbeddingModel = {
    EmbedCounters.loads.incrementAndGet()
    val inner = HashProjectionModel(dimIn, dimOut, seed, batch)
    new EmbeddingModel {
      val name = inner.name
      val dimIn = inner.dimIn
      val dimOut = inner.dimOut
      val maxBatch = inner.maxBatch
      def embedBatch(inputs: Array[Array[Float]]): Array[Array[Float]] = {
        EmbedCounters.maxBatchSeen.getAndAccumulate(inputs.length, math.max)
        inner.embedBatch(inputs)
      }
      override def close(): Unit = { EmbedCounters.closes.incrementAndGet() }
    }
  }
}

class EmbeddingModelSpec extends SparkTestBase {
  import EmbeddingPipeline._

  private def media(n: Int, parts: Int) = {
    val s = spark
    import s.implicits._
    val src = (0 until n)
      .map(i => (i.toLong, s"document text number ${i % 40} with body ${"x" * (i % 17)}"))
      .toDF("id", "text")
    Multimodal.syntheticMedia(s, src, "id", "text").repartition(parts)
  }

  test("model loads once per non-empty partition, batches respect maxBatch, closes every load") {
    EmbedCounters.reset()
    val loader = CountingLoader(dimIn = 16, dimOut = 8, seed = 7L, batch = 8)
    val out = embedMedia(media(100, 4), loader).collect()
    assert(out.length === 100)
    assert(EmbedCounters.loads.get() >= 1 && EmbedCounters.loads.get() <= 4,
      s"expected <=1 load per partition, got ${EmbedCounters.loads.get()}")
    assert(EmbedCounters.maxBatchSeen.get() <= 8)
    assert(EmbedCounters.closes.get() === EmbedCounters.loads.get(),
      "every loaded model must be closed at task completion")
  }

  test("embeddings are unit-norm, fixed-dim, and invariant to partitioning") {
    val loader = HashProjectionLoader(dimIn = 16, dimOut = 8, seed = 7L)
    def run(parts: Int) =
      embedMedia(media(60, parts), loader).collect()
        .map(e => e.media_id -> e.embedding.toSeq).toMap
    val a = run(1)
    val b = run(7)
    assert(a === b, "embedding must not depend on batch/partition composition")
    a.values.foreach { v =>
      assert(v.length === 8)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"expected unit norm, got $n")
    }
  }

  test("bytes -> model -> cells -> semdedup verdicts: duplicates dropped, deterministic") {
    val s = spark
    import s.implicits._
    // 30 distinct docs, each with an exact duplicate at id+1000
    val base = (0 until 30).map(i => (i.toLong, s"corpus doc $i payload ${"y" * (i % 11)}"))
    val src = (base ++ base.map { case (i, t) => (i + 1000, t) }).toDF("id", "text")
    val loader = HashProjectionLoader(dimIn = 16, dimOut = 8, seed = 7L)
    val corpus = asCorpus(embedMedia(Multimodal.syntheticMedia(s, src, "id", "text"), loader))
    val centroids = Similarity.fitIvfCentroids(corpus, nClusters = 2)

    def verdicts(parts: Int) = semDedupMedia(
      Multimodal.syntheticMedia(s, src.repartition(parts), "id", "text"),
      loader, centroids, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet

    val v = verdicts(3)
    assert(v === verdicts(5), "verdicts must be partitioning-invariant")
    assert(v.size === 60)
    // every duplicate (higher id of an identical-payload pair) is dropped
    (0 until 30).foreach { i =>
      assert(v.exists { case (id, _, dropped) => id == i + 1000 && dropped },
        s"exact duplicate ${i + 1000} must be dropped")
    }
    // a verdict only drops the HIGHER id of a pair, so the lowest id
    // in every cell is always kept (n=60 < cap, so subcell == cell)
    v.groupBy(_._2).foreach { case (cell, rows) =>
      val minId = rows.map(_._1).min
      assert(rows.exists { case (id, _, dropped) => id == minId && !dropped },
        s"lowest id $minId in cell $cell must be kept")
    }
  }

  test("semDedupMedia runs the model forward pass once, not once per plan branch") {
    val s = spark
    import s.implicits._
    val src = (0 until 40).map(i => (i.toLong, s"amortize doc $i ${"z" * (i % 5)}")).toDF("id", "text")
    val loader0 = HashProjectionLoader(dimIn = 16, dimOut = 8, seed = 7L)
    val corpus = asCorpus(embedMedia(Multimodal.syntheticMedia(s, src, "id", "text"), loader0))
    val centroids = Similarity.fitIvfCentroids(corpus, nClusters = 2)

    EmbedCounters.reset()
    val parts = 3
    val out = semDedupMedia(
      Multimodal.syntheticMedia(s, src.repartition(parts), "id", "text"),
      CountingLoader(dimIn = 16, dimOut = 8, seed = 7L, batch = 8),
      centroids, threshold = 0.99)
    out.collect()
    // the assigned-cells lineage is persisted before the count-agg,
    // self-join sides, and verdict join consume it — so decode+embed
    // executes once (<= 1 load per input partition), not ~5x
    assert(EmbedCounters.loads.get() <= parts,
      s"embedding lineage re-executed: ${EmbedCounters.loads.get()} loads for $parts partitions")
  }

  test("a misconfigured loader (maxBatch <= 0) fails at construction/load, not mid-task") {
    intercept[IllegalArgumentException](HashProjectionModel(16, 8, 7L, maxBatch = 0))
    intercept[IllegalArgumentException](HashProjectionModel(16, 8, 7L, maxBatch = -3))
  }
}
