package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CountMin

/**
 * Streaming face of the Count-Min frequency sketch
 * ([[graft.functions.CountMin]], t36) — completes the sketch-family
 * streaming symmetry: HLL/KMV stores merge IN PLACE (idempotent
 * algebra), histogram/Count-Min counters are ADDITIVE and therefore
 * use the append-facts contract ([[StreamingLogHistogram]]'s): each
 * micro-batch appends its own depth×width counter rows stamped with
 * the batch id; replays re-append bit-identical rows the read-time
 * rollup collapses by (group, d, bucket, batch_id) identity. Appended
 * rows are sketch-bounded per batch, never value-sized.
 *
 * Unbounded-append is handled by [[SketchCompaction]] exactly as for
 * [[StreamingLogHistogram]]: [[compact]] folds stamped counters into
 * a merged base + batch high-water mark, [[sketchAt]] reads
 * base + facts-since — the store stays groups × depth × width-sized
 * over any stream lifetime.
 */
object StreamingCountMin {

  /** One batch → its stamped counter rows. Pure; spec-drivable. */
  def batchCounters(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int, width: Int, batchId: Long): DataFrame =
    CountMin.sketch(batch, groupCols.map(col), col(valueCol).cast("string"),
        depth, width)
      .withColumn("batch_id", lit(batchId))

  /** Attach to a stream; stamped counter rows append under `path`.
   * `compactEvery` > 0 folds the appends into the compacted base
   * every that-many batches (in-line, so the fold never races its
   * own appender). */
  def attach(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int, width: Int, path: String, checkpoint: String,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchCounters(batch, groupCols, valueCol, depth, width, batchId)
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
    SketchCompaction.compact(path, groupCols, Seq("d", "bucket"))

  /** The sketch as of now, compaction-aware: merged base + the facts
   * appended since — feeds [[CountMin.estimate]] unchanged whether or
   * not a compaction has ever run. */
  def sketchAt(path: String, groupCols: Seq[String])(
      implicit spark: SparkSession): DataFrame =
    SketchCompaction.counters(path, groupCols, Seq("d", "bucket"))

  /** The sketch as of now: replay copies collapsed, then the additive
   * rollup — feeds [[CountMin.estimate]] unchanged. */
  def sketch(facts: DataFrame, groupCols: Seq[String]): DataFrame =
    facts
      .dropDuplicates(groupCols ++ Seq("d", "bucket", "batch_id"))
      .groupBy(groupCols.map(col) :+ col("d") :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"))
}
