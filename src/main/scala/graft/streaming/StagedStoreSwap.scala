package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Crash-safe stage-then-swap for parquet-backed streaming stores
 * ([[StreamingFuzzyLink]], [[StreamingNearDedup]] compaction). Spark
 * cannot overwrite a path it is reading, so compaction must write a
 * staged copy first; the naive second step (Overwrite the live path)
 * has a crash window between its delete and its rewrite that leaves
 * the store MISSING — which a read-time "missing = fresh store"
 * mapping turns into a silently empty state and a permanent
 * stream-vs-batch parity break.
 *
 * Invariants this object maintains:
 *  - the staged snapshot is deleted only AFTER the swap into `path`
 *    completes, so at every instant at least one complete image of
 *    the store exists on disk;
 *  - [[recover]] restores the staged snapshot when `path` is missing
 *    (the crashed-swap signature) and deletes the stage afterward —
 *    a stale stage must not outlive its recovery, or a LATER
 *    intentional deletion of the store (fresh pipeline, same paths)
 *    would silently resurrect the old snapshot.
 */
private[streaming] object StagedStoreSwap {

  def stagedPath(path: String): String = s"$path-staged"

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Swap the already-written staged snapshot into `path`, then
   * delete the stage. Call after writing the compacted store to
   * [[stagedPath]]. */
  def swapFromStaged(spark: SparkSession, path: String): Unit = {
    spark.read.parquet(stagedPath(path))
      .write.mode(SaveMode.Overwrite).parquet(path)
    delete(spark, stagedPath(path))
  }

  /** A stage that survives while `path` itself reads fine is an
   * ORPHAN: the compaction crashed after writing the stage but BEFORE
   * [[swapFromStaged]] touched the live path (live store intact, swap
   * never ran). Left alone it outlives every recovery window, and if
   * the store is later deleted ON PURPOSE (fresh pipeline, same
   * paths) [[recover]] would resurrect the stale snapshot.
   *
   * Callers invoke this ONCE at stream start (`attach`, before the
   * query runs) — a point where no compaction can be in flight BY
   * CONSTRUCTION, not by the prose single-writer contract alone. An
   * earlier design swept on every successful store read, which raced
   * a concurrently running compaction: the read would delete the
   * stage the compaction had just written and [[swapFromStaged]] then
   * failed reading the deleted path mid-swap.
   *
   * Only a SUCCESSFUL live read proves the stage is an orphan: a live
   * path that is missing (crashed swap — [[recover]]'s case) or
   * unreadable (partial rewrite) must keep its stage, which is the
   * only complete image of the store at that point. */
  def clearOrphanedStage(spark: SparkSession, path: String): Unit =
    if (exists(spark, stagedPath(path))) {
      val liveReads =
        try { spark.read.parquet(path); true }
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      if (liveReads) delete(spark, stagedPath(path))
    }

  /** `path` failed to read as missing: if a staged snapshot survives
   * (a compaction crashed between its delete and rewrite of `path`),
   * restore it into `path`, drop the stage, and return the restored
   * store; else None (genuinely fresh store). */
  def recover(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, stagedPath(path))) {
      spark.read.parquet(stagedPath(path))
        .write.mode(SaveMode.Overwrite).parquet(path)
      delete(spark, stagedPath(path))
      Some(spark.read.parquet(path))
    } else None
}
