package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Composed ingest-time curation for a streaming document corpus — the
 * one-attach streaming face of `TextAnalysis.cleanCorpus`'s batch
 * chain, ordered so each stage shrinks what the next must hold state
 * for:
 *
 *  1. **Quality gate** (the t17 hashed linear classifier, keep =
 *     integer logit sum > 0): stateless map-side filter FIRST, so
 *     junk never occupies dedup state;
 *  2. **Exact dedup** ([[StreamingDedup]]): watermark-bounded digest
 *     state kills the exact-copy firehose;
 *  3. **Near-dedup** ([[StreamingNearDedup]]): LSH band-key store
 *     suppresses near-copies across batches within the horizon;
 *  4. **Decontamination** (optional, [[StreamingDecontaminate]]):
 *     survivors are checked against the held-out eval guard — Bloom
 *     prefilter then exact containment — before the append. Last on
 *     purpose: it is the most expensive per-doc check, so it should
 *     see the fewest documents.
 *
 * Stages 1-2 compose INTO the streaming plan (filter +
 * dropDuplicatesWithinWatermark); stages 3-4 run in the foreachBatch
 * sink because their membership stores live outside Spark state.
 * State across the whole chain is bounded by the two horizons plus
 * the fixed eval guard, never by stream lifetime — the property that
 * keeps this viable on an unbounded feed.
 */
object StreamingCorpusIngest {

  /** @param horizon   exact-dedup watermark delay (e.g. "10 minutes")
    * @param horizonSec near-dedup band-key memory in seconds
    * @param guard      optional eval-set decontamination guard
    *                   ([[StreamingDecontaminate.fitGuard]]) */
  def attach(stream: DataFrame, keyCol: String, textCol: String, tsCol: String,
      storePath: String, outPath: String, checkpoint: String,
      horizon: String = "10 minutes", horizonSec: Long = 600L,
      guard: Option[StreamingDecontaminate.Guard] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val gated = stream.filter(TextAnalysis.qualityRawSum(col(textCol)) > 0)
    val exact = StreamingDedup.dedupStream(gated, tsCol, md5(col(textCol)), horizon)
    exact.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val surviving = StreamingNearDedup.processBatch(batch.sparkSession, batch,
          keyCol, textCol, tsCol, storePath, horizonSec, batchId)
        guard.fold(surviving)(g => StreamingDecontaminate.processBatch(surviving, g))
          .write.mode(SaveMode.Append).parquet(outPath)
      }
      .start()
  }
}
