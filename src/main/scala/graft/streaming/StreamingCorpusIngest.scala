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
 *     suppresses near-copies across batches within the horizon; kept
 *     rows append to `outPath`.
 *
 * Stages 1-2 compose INTO the streaming plan (filter +
 * dropDuplicatesWithinWatermark); stage 3 runs in the foreachBatch
 * sink because its membership store lives outside Spark state. State
 * across the whole chain is bounded by the two horizons, never by
 * stream lifetime — the property that keeps this viable on an
 * unbounded feed.
 */
object StreamingCorpusIngest {

  /** @param horizon   exact-dedup watermark delay (e.g. "10 minutes")
    * @param horizonSec near-dedup band-key memory in seconds */
  def attach(stream: DataFrame, keyCol: String, textCol: String, tsCol: String,
      storePath: String, outPath: String, checkpoint: String,
      horizon: String = "10 minutes", horizonSec: Long = 600L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val gated = stream.filter(TextAnalysis.qualityRawSum(col(textCol)) > 0)
    val exact = StreamingDedup.dedupStream(gated, tsCol, md5(col(textCol)), horizon)
    exact.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingNearDedup.processBatch(batch.sparkSession, batch,
          keyCol, textCol, tsCol, storePath, horizonSec, batchId)
          .write.mode(SaveMode.Append).parquet(outPath)
      }
      .start()
  }
}
