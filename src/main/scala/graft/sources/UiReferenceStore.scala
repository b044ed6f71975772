package graft.sources

import graft.streaming.IngestPipeline.StatusUpdate
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reference-state table (UIReferenceTable analogue) with an IDEMPOTENT
 * merge — SURVEY §7.4 hard part 4: exactly-once upsert of
 * change-suppressed status updates across retried micro-batches.
 *
 * Merge key is (machineId); the winning row per key is the one with
 * the greatest (machineStatusUpdatedTimestamp, machineStatus) — so
 * replaying a batch (foreachBatch retry) or merging the same update
 * twice is a no-op, and out-of-order merges converge to the same
 * state. Implemented as read→union→keep-latest→overwrite on parquet;
 * on a transactional table format the same keep-latest rule becomes
 * the MERGE condition.
 */
object UiReferenceStore {

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long)]
      .toDF("machineId", "machineStatus", "machineStatusUpdatedTimestamp")
  }

  /** Filesystem handle through the Hadoop API so paths work on any
   * supported scheme (file://, hdfs://, s3a://), not just local disk. */
  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val (f, p) = fs(spark, path)
    if (f.exists(p)) spark.read.parquet(path)
    else emptyState(spark)
  }

  /** Idempotent keep-latest merge of status updates into the store. */
  def merge(spark: SparkSession, path: String, updates: Dataset[StatusUpdate]): Unit = {
    val incoming = updates.toDF()
      .select(col("machineId"), col("machineStatus"),
        col("machineStatusUpdatedTimestamp"))
    val merged = read(spark, path)
      .unionByName(incoming)
      .groupBy(col("machineId"))
      .agg(max_by(
        struct(col("machineStatus"), col("machineStatusUpdatedTimestamp")),
        struct(col("machineStatusUpdatedTimestamp"), col("machineStatus"))).as("_s"))
      .select(col("machineId"), col("_s.machineStatus"),
        col("_s.machineStatusUpdatedTimestamp"))
    // stage-then-swap so a failed write never truncates current state:
    // write to .staging, swap current out of the way, rename staging in,
    // and only then drop the old state. Every rename result is checked —
    // a false return aborts with the previous state still recoverable.
    val staged = path + ".staging"
    val backup = path + ".old"
    merged.write.mode(SaveMode.Overwrite).parquet(staged)
    val (f, target) = fs(spark, path)
    val stagedP = new org.apache.hadoop.fs.Path(staged)
    val backupP = new org.apache.hadoop.fs.Path(backup)
    if (f.exists(backupP)) f.delete(backupP, true)
    if (f.exists(target)) {
      require(f.rename(target, backupP), s"could not move current state aside: $path")
    }
    require(f.rename(stagedP, target), s"could not promote staged state: $staged -> $path")
    f.delete(backupP, true)
    ()
  }

  /** Hydration view for cold-start initial state (machineId → status). */
  def asInitialState(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    read(spark, path).select(col("machineId"), col("machineStatus"))
      .as[(String, String)]
  }
}
