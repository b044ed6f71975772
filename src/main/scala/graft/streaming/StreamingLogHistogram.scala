package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.LogHistogram

/**
 * Streaming face of the log-histogram quantile sketch
 * ([[graft.functions.LogHistogram]], query x20): each micro-batch
 * appends its OWN per-group bin counts stamped with the batch id; the
 * current sketch is a read-time additive rollup.
 *
 * Contrast with [[StreamingHll]]: HLL's register-max is idempotent,
 * so its store can be merged in place with no replay bookkeeping.
 * Histogram counts are ADDITIVE — re-adding a replayed batch would
 * inflate them — so this face uses the append-facts contract instead
 * ([[StreamingCorpusCard]]'s): appends are immutable, batch-id-keyed,
 * and replays re-append BIT-IDENTICAL rows that the read-time rollup
 * collapses by (group, bin, batch_id) identity. Per-batch work is one
 * aggregation over the batch; the appended rows are bin-bounded
 * (≤ ~488 per group per batch), never value-sized.
 */
object StreamingLogHistogram {

  /** One batch → its stamped bin-count rows. Pure; spec-drivable. */
  def batchBins(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      batchId: Long): DataFrame =
    LogHistogram.sketch(batch, groupCols.map(col), col(valueCol))
      .withColumn("batch_id", lit(batchId))

  /** Attach to a stream of (groupCols..., valueCol) rows; stamped bin
   * counts append under `path`. */
  def attach(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchBins(batch, groupCols, valueCol, batchId)
          .write.mode(SaveMode.Append).parquet(path)
        ()
      }
      .start()

  /** The sketch as of now: replay copies collapsed by the
   * (group, bin, batch_id) fact identity, then the additive rollup —
   * feed straight into [[LogHistogram.quantiles]]. */
  def sketch(facts: DataFrame, groupCols: Seq[String]): DataFrame =
    facts
      .dropDuplicates(groupCols ++ Seq("bin", "batch_id"))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("n")).as("n"))
}
