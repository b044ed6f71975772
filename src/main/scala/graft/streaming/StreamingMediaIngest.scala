package graft.streaming

import graft.functions.{EmbeddingModelLoader, EmbeddingPipeline, Multimodal}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Live multimodal ingest: raw media bytes arriving on a stream are
 * decoded, embedded through the pluggable [[EmbeddingModelLoader]]
 * seam, and appended to a bootstrapped [[StreamingIvfIndex]] — bytes
 * in, probe-pruned ANN serving out at the next micro-batch. This is
 * the streaming face of [[EmbeddingPipeline]]: the model still loads
 * once per partition WITHIN each micro-batch (a long-lived runtime
 * can cache the session executor-side in its loader), the binary
 * payload still never shuffles (consumed by the same `mapPartitions`
 * that decodes it), and everything downstream of the embedding —
 * cell assignment, batch-id stamping, replay collapse, compaction —
 * is exactly [[StreamingIvfIndex]]'s contract.
 *
 * Contract: media_id is the vec_id; the stream carries NEW ids
 * (upstream [[StreamingDedup]] on a payload digest guarantees that).
 * Embedding is deterministic per payload, so an at-least-once replay
 * appends bit-identical rows and the serving collapse holds.
 */
object StreamingMediaIngest {

  /** Attach a stream of media rows to the index at `path`
   * (bootstrapped with [[StreamingIvfIndex.bootstrap]], typically
   * from [[EmbeddingPipeline.embedMedia]] over a seed corpus). */
  def attach(mediaStream: Dataset[Multimodal.MediaRow],
      loader: EmbeddingModelLoader, path: String,
      checkpoint: String): StreamingQuery =
    StreamingIvfIndex.attach(
      EmbeddingPipeline.asCorpus(EmbeddingPipeline.embedMedia(mediaStream, loader)),
      path, checkpoint)
}
