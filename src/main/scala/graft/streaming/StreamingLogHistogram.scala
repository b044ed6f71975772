package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
 *
 * Unbounded-append is handled by [[SketchCompaction]]: [[compact]]
 * periodically folds the stamped facts into a merged base + batch
 * high-water mark (crash-safe swap), and [[sketchAt]] reads
 * base + facts-since-compaction — so the store stays
 * groups × bins-sized over any stream lifetime instead of growing
 * with batch count. `attach(compactEvery = n)` runs the fold in-line
 * every n batches.
 */
object StreamingLogHistogram {

  /** One batch → its stamped bin-count rows. Pure; spec-drivable. */
  def batchBins(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      batchId: Long): DataFrame =
    LogHistogram.sketch(batch, groupCols.map(col), col(valueCol))
      .withColumn("batch_id", lit(batchId))

  /** Attach to a stream of (groupCols..., valueCol) rows; stamped bin
   * counts append under `path`. `compactEvery` > 0 folds the appends
   * into the compacted base every that-many batches (in-line in
   * foreachBatch, so the fold never races its own appender). */
  def attach(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, checkpoint: String, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchBins(batch, groupCols, valueCol, batchId)
          .write.mode(SaveMode.Append).parquet(path)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compact(path, groupCols)(spark)
        ()
      }
      .start()
  }

  /** Fold the stamped appends into the compacted base (see
   * [[SketchCompaction.compact]]); read equality is invariant. */
  def compact(path: String, groupCols: Seq[String])(
      implicit spark: SparkSession): Unit =
    SketchCompaction.compact(path, groupCols, Seq("bin"))

  /** The sketch as of now, compaction-aware: merged base + the facts
   * appended since — same output shape as [[sketch]], feeds
   * [[LogHistogram.quantiles]] unchanged whether or not a compaction
   * has ever run. */
  def sketchAt(path: String, groupCols: Seq[String])(
      implicit spark: SparkSession): DataFrame =
    SketchCompaction.counters(path, groupCols, Seq("bin"))

  /** The sketch as of now: replay copies collapsed by the
   * (group, bin, batch_id) fact identity, then the additive rollup —
   * feed straight into [[LogHistogram.quantiles]]. */
  def sketch(facts: DataFrame, groupCols: Seq[String]): DataFrame =
    facts
      .dropDuplicates(groupCols ++ Seq("bin", "batch_id"))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("n")).as("n"))
}
