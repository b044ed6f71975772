package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Pluggable embedding-model inference seam for the multimodal →
 * curation pipeline: opaque media bytes → decoded features → a
 * batched model forward pass → `(vec_id, embedding)` rows that the
 * whole [[Similarity]] / SemDeDup / kNN-graph family consumes
 * unchanged.
 *
 * The interface is ONNX-Runtime-shaped on purpose: a real deployment
 * wraps an `OrtSession` — created once per executor partition from
 * model bytes, fed fixed-width `float32[batch, dimIn]` tensors, one
 * `float32[batch, dimOut]` tensor back per `run()` — behind
 * [[EmbeddingModel.embedBatch]] without touching any plan code. The
 * inference libraries are not available in this environment, so the
 * shipped implementation is [[HashProjectionModel]], a deterministic
 * stand-in with the same contract (fixed dims, batched calls,
 * per-partition lifecycle); the Spark-side plumbing — partition-
 * amortized load, batch shaping, close-on-task-end, schema — is real
 * and tested.
 *
 * Scale notes: the model loads ONCE per partition (weights are
 * executor-local, never shuffled), rows flow through in `maxBatch`
 * slices (the tensor-width amortization a real runtime needs), and
 * the binary payload is consumed inside the same `mapPartitions` that
 * decodes it — only the fixed-width embedding ever reaches a shuffle.
 */
trait EmbeddingModel extends AutoCloseable {
  def name: String
  /** Fixed input-tensor width — features per row (an ONNX session's
   * declared input shape; shorter feature vectors are zero-padded,
   * longer ones truncated, by the caller). */
  def dimIn: Int
  /** Output embedding dimension. */
  def dimOut: Int
  /** Preferred rows per [[embedBatch]] call (tensor batch size). */
  def maxBatch: Int
  /** One forward pass: `inputs` is `[batch][dimIn]` (at most
   * [[maxBatch]] rows — the caller slices), result is
   * `[batch][dimOut]`, row-aligned. Must be deterministic for a given
   * input row independent of batch composition (true of any stateless
   * forward pass; required so results are partitioning-invariant).
   *
   * Numeric-precision contract: a real float32 runtime (ONNX) ALSO
   * accumulates in float32, while the shipped stand-in accumulates
   * its dot products in Double before narrowing — so parity tests
   * tuned against the stand-in can drift at the last-ulp rounding
   * boundary (e.g. `round(cosine, 6) >= threshold`) once a real
   * session is plugged in. Downstream thresholds should not be set
   * exactly AT a value the stand-in produces. */
  def embedBatch(inputs: Array[Array[Float]]): Array[Array[Float]]
  /** Release session/native resources (invoked at task completion). */
  override def close(): Unit = ()
}

/** What actually ships to executors: a small serializable factory
 * (model path / bytes / config), NOT the model — a real ONNX session
 * holds native handles and is not serializable. Invoked once per
 * partition. */
trait EmbeddingModelLoader extends Serializable {
  def load(): EmbeddingModel
}

/**
 * Deterministic reference model: a seeded ±1 projection (Achlioptas
 * sparse-JL, same construction as [[Similarity.rademacherSign]] but
 * seed-keyed) followed by L2 normalization — so downstream cosine
 * arithmetic sees unit vectors, like a real sentence/image encoder
 * emits. No RNG state: the "weights" are md5-derived from
 * `(seed, j, i)`, identical on every executor with nothing broadcast.
 */
object HashProjectionModel {
  /** The ±1 projection weight for (seed, output dim j, input dim i) —
   * exposed so an engine-portable oracle can freeze the identical
   * weight matrix as SQL literals (the m3 generated-constant
   * pattern). */
  def signOf(seed: Long, j: Int, i: Int): Float = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"em:$seed:$j|$i".getBytes("UTF-8"))
    if ((digest(0) & 1) == 0) 1f else -1f
  }
}

final case class HashProjectionModel(dimIn: Int, dimOut: Int, seed: Long,
    maxBatch: Int = 64) extends EmbeddingModel {
  require(dimIn > 0 && dimOut > 0, s"dims must be positive: dimIn=$dimIn dimOut=$dimOut")
  require(maxBatch > 0, s"maxBatch must be positive, got $maxBatch")
  val name = s"hash-projection-$seed"

  private def sign(j: Int, i: Int): Float = HashProjectionModel.signOf(seed, j, i)
  // dimOut × dimIn — materialized once per load, the analogue of a
  // real runtime deserializing weights at session creation
  private val w: Array[Array[Float]] =
    Array.tabulate(dimOut, dimIn)((j, i) => sign(j, i))

  def embedBatch(inputs: Array[Array[Float]]): Array[Array[Float]] =
    inputs.map { v =>
      require(v.length == dimIn, s"input width ${v.length} != dimIn $dimIn")
      val out = Array.tabulate(dimOut) { j =>
        var s = 0.0; var i = 0
        while (i < dimIn) { s += w(j)(i) * v(i); i += 1 }
        s
      }
      val n = math.sqrt(out.map(x => x * x).sum)
      if (n == 0.0) out.map(_.toFloat)
      else out.map(x => (x / n).toFloat)
    }
}

final case class HashProjectionLoader(dimIn: Int, dimOut: Int, seed: Long,
    maxBatch: Int = 64) extends EmbeddingModelLoader {
  def load(): EmbeddingModel = HashProjectionModel(dimIn, dimOut, seed, maxBatch)
}

/**
 * The pipeline stage that joins [[Multimodal]] (bytes → features) to
 * [[Similarity]] (embeddings → cells → verdicts) through an
 * [[EmbeddingModelLoader]].
 */
object EmbeddingPipeline {

  /** One embedded media item — `media_id` doubles as the `vec_id` the
   * similarity family keys on. */
  final case class MediaEmbedding(media_id: Long, kind: String,
      modality: String, embedding: Array[Float])

  /** Zero-pad / truncate a decoded feature vector to the model's
   * fixed input width (the preprocessing a fixed-shape session
   * requires). */
  def prepInput(feats: Array[Double], dimIn: Int): Array[Float] = {
    val out = new Array[Float](dimIn)
    var i = 0
    while (i < dimIn && i < feats.length) { out(i) = feats(i).toFloat; i += 1 }
    out
  }

  /**
   * bytes → features → model, one `mapPartitions`: the model loads
   * once per non-empty partition, is fed `maxBatch`-row slices, and is
   * closed at task completion (success or failure) via the task
   * listener — the lifecycle a native-handle runtime needs. The binary
   * payload never leaves this stage.
   */
  def embedMedia(media: Dataset[Multimodal.MediaRow],
      loader: EmbeddingModelLoader): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val model = loader.load()
        // fail at load, not deep inside grouped(): a non-positive batch
        // width is a misconfigured loader
        require(model.maxBatch > 0,
          s"model ${model.name} declares maxBatch=${model.maxBatch}; must be positive")
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => model.close()))
        rows.grouped(model.maxBatch).flatMap { batch =>
          val decoded = batch.map { r =>
            val (modality, feats) = Multimodal.decodeBytes(r.payload)
            (r, modality, prepInput(feats, model.dimIn))
          }
          val out = model.embedBatch(decoded.map(_._3).toArray)
          decoded.iterator.zip(out.iterator).map { case ((r, modality, _), emb) =>
            MediaEmbedding(r.media_id, r.kind, modality, emb)
          }
        }
      }
    }
  }

  /** Rename into the `(vec_id, embedding)` corpus shape every
   * [[Similarity]] operator consumes. */
  def asCorpus(embedded: Dataset[MediaEmbedding]): DataFrame =
    embedded.toDF().select(col("media_id").as("vec_id"), col("embedding"))

  /**
   * End-to-end curation over raw media: embed, assign to fixed IVF
   * cells (map-only literal-centroid argmin), cap the per-cell pair
   * space, and emit SemDeDup verdicts — the same cell-bounded
   * pair-join shape as the e3 query, so the plan inherits its scale
   * properties (Σ|subcell|² candidates, equi-join, no cartesian).
   * Output: (vec_id, cell, dropped).
   */
  def semDedupMedia(media: Dataset[Multimodal.MediaRow],
      loader: EmbeddingModelLoader,
      centroids: Seq[(Int, Seq[Float])],
      threshold: Double,
      maxCellSide: Int = 2048): DataFrame = {
    // The plan below references the assigned corpus from several
    // branches (boundCells' per-cell count agg + join, both self-join
    // sides, the final verdict join). PERSIST the embedding lineage
    // once: decode + model forward pass is the dominant cost this seam
    // exists to amortize, and recomputing it per branch would also let
    // any model non-determinism (real GPU sessions can differ at the
    // ulp level between runs) produce inconsistent cell assignments
    // across branches. Mirrors how the e3 query reads its assignment
    // from a materialized parquet table rather than a live lineage.
    val cells = Similarity.assignCells(asCorpus(embedMedia(media, loader)), centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager (both levels): AQE materializes the referencing subtrees
    // concurrently, and an uncomputed cache block is recomputed by
    // each — which would run the decode + model forward pass once per
    // branch, exactly what these persists exist to prevent (see
    // Dedup.shingleSets' AQE note)
    cells.count()
    val assigned = Similarity.boundCells(cells, maxCellSide)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    // norms staged per ROW before the pair join (cosineWithNorms —
    // bit-identical, 1 FloatVecDot per pair instead of 3)
    val l = assigned.select(col("subcell"), col("vec_id").as("_ida"),
      col("embedding").as("_va"), Similarity.norm(col("embedding")).as("_na"))
    val r = assigned.select(col("subcell"), col("vec_id").as("_idb"),
      col("embedding").as("_vb"), Similarity.norm(col("embedding")).as("_nb"))
    val dropped = l.join(r, Seq("subcell"))
      .filter(col("_ida") < col("_idb") &&
        round(Similarity.cosineWithNorms(
          col("_va"), col("_vb"), col("_na"), col("_nb")), 6) >= threshold)
      .select(col("_idb").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("_hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("_hit").isNotNull.as("dropped"))
  }
}
