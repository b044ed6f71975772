package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming exact dedup — the streaming face of `Dedup.exact`: drop
 * re-occurrences of a content digest as the corpus streams in, the
 * ingest-time guard a training-data pipeline puts in front of its
 * raw-document sink (the batch dedup still runs downstream for
 * near-dups; this kills the exact-copy firehose early).
 *
 * Built on `dropDuplicatesWithinWatermark`: state holds one digest per
 * distinct document and is EVICTED once the watermark passes it, so
 * state size is bounded by the dedup horizon, not the stream's
 * lifetime — the property that makes this viable on an unbounded
 * 100 TB/day feed (an unwatermarked dropDuplicates would grow state
 * forever). Duplicates arriving within the horizon are suppressed
 * even across micro-batches; a copy arriving after the horizon is
 * treated as new (by design — horizon = the dedup guarantee window).
 *
 * State partitions by digest hash across executors; no driver-side
 * membership structure.
 */
object StreamingDedup {

  /**
   * @param stream    streaming DataFrame
   * @param tsCol     event-time column (TimestampType) the watermark
   *                  tracks
   * @param digestOf  content digest expression (e.g. `md5(col("text"))`)
   * @param horizon   watermark delay, e.g. "10 minutes" — how long a
   *                  digest is remembered
   */
  def dedupStream(stream: DataFrame, tsCol: String, digestOf: Column,
      horizon: String): DataFrame =
    stream
      .withColumn("_digest", digestOf)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")
}
