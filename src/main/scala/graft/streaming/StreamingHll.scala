package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hll

/**
 * Streaming face of the mergeable HLL sketch store
 * ([[graft.functions.Hll]], queries o10-o12): maintain one 1 KiB
 * distinct-count sketch per group INCREMENTALLY — each micro-batch is
 * sketched on its own (one aggregation over batch rows only) and
 * register-max-merged into the persisted store.
 *
 * Why this shape is the scale-correct one:
 *  - per-batch cost is one map-side-combined aggregation over the
 *    BATCH, never a rescan of history — the store read/written per
 *    batch is group-cardinality-sized (1 KiB per group);
 *  - at-least-once safety comes from the ALGEBRA, not bookkeeping:
 *    register-max merge is idempotent AND commutative, so replaying a
 *    batch (or merging batches out of order) cannot move any register
 *    — no batch-id stamps, no dedup pass, unlike the append-fact
 *    stores ([[StreamingCorpusCard]]) that must collapse replays;
 *  - the streamed store is BIT-IDENTICAL to the batch sketch of the
 *    same prefix (max is associative), so every read-side consumer
 *    (`Hll.stats`, the o10 rollup) is oblivious to which path built
 *    the store.
 *
 * The store swap is write-new → atomic rename, the
 * [[graft.sources.UiReferenceStore]] pattern.
 */
object StreamingHll {

  /** One batch folded into the store: sketch the batch per group,
   * union with the existing store, register-max per group. Pure —
   * the spec drives it directly. */
  def mergeBatch(store: Option[DataFrame], batch: DataFrame,
      groupCols: Seq[String], valueCol: String): DataFrame = {
    val bsk = batch
      .groupBy(groupCols.map(col): _*)
      .agg(Hll.sketch(col(valueCol).cast("string")).as("sk"))
    store match {
      case None => bsk
      case Some(st) =>
        st.select(groupCols.map(col) :+ col("sk"): _*).unionByName(bsk)
          .groupBy(groupCols.map(col): _*)
          .agg(Hll.merge(col("sk")).as("sk"))
    }
  }

  /**
   * Read the current store, completing a half-finished swap first: a
   * crash between delete(path) and rename(tmp, path) leaves the ONLY
   * copy of the store in the hidden temp sibling — treating that as
   * "no store yet" would silently reset every sketch (the same
   * mid-swap crash state [[graft.sources.Warehouse.compactPartition]]
   * recovers). Returns None only when neither location exists.
   */
  private[streaming] def readStore(path: String)(
      implicit spark: SparkSession): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    if (!fs.exists(live) && fs.exists(tmp) &&
        fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"sketch store swap recovery failed: $tmp -> $path")
    }
    if (fs.exists(live)) Some(spark.read.parquet(path).localCheckpoint(true))
    else None
  }

  /** The swap itself: write-new → delete-old → rename; shared by the
   * HLL and KMV stores. */
  private[streaming] def swapStore(next: DataFrame, path: String)(
      implicit spark: SparkSession): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // guarantee the completeness marker the recovery path keys on
    val marker = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, true).close()
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(path)))
      throw new java.io.IOException(s"sketch store swap failed: $tmp -> $path")
  }

  /** Attach to a stream: per micro-batch, fold into the parquet store
   * at `path` (atomic swap via temp dir + rename; mid-swap crashes
   * recover on the next batch's read). */
  def attach(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, checkpoint: String)(implicit spark: SparkSession)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = mergeBatch(readStore(path), batch, groupCols, valueCol)
          .localCheckpoint(true) // cut lineage off the files we replace
        swapStore(next, path)
        ()
      }
      .start()

  /** Read-side estimates off the store — same consumer as the batch
   * o10 rollup. */
  def estimates(store: DataFrame, groupCols: Seq[String]): DataFrame =
    store.select(groupCols.map(col) :+ Hll.stats(col("sk")).as("st"): _*)
      .select(groupCols.map(col) :+ col("st.v").as("v") :+ col("st.s").as("s")
        :+ col("st.estimate").as("estimate"): _*)
}
