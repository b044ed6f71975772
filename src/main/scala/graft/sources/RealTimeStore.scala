package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Physical layout for the real-time fact table — the one storage-design
 * decision SURVEY §4 puts on us: bucket by series id and sort by
 * timestamp so the interactive query (`id = X AND ts BETWEEN a AND b`)
 * prunes like the DynamoDB key schema it replaces.
 *
 * With `bucketBy(n, id) sortBy(id, messageTimestamp)`:
 *  - an equality/isin predicate on `id` prunes to the matching buckets
 *    (SelectedBucketsCount in the scan — asserted in tests);
 *  - within a bucket, rows are sorted by (id, ts), so the BETWEEN scan
 *    is a contiguous range (min/max page skipping in parquet);
 *  - joins and aggregations keyed on `id` are co-partitioned — no
 *    shuffle for per-series work (the condensation groupBy picks up
 *    the bucketing through its first grouping key at cluster scale).
 *
 * For interactive point queries set
 * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` —
 * Spark's DisableUnnecessaryBucketedScan rule otherwise skips the
 * bucketed read (and its pruning) for filter-only plans, preferring
 * split parallelism; for the per-series dashboard query pruning wins.
 *
 * TTL compaction rewrites live rows only
 * (IngestPipeline.compactExpired) — the batch analogue of DynamoDB's
 * lazy TTL deletes.
 */
object RealTimeStore {

  /** Create/overwrite the bucketed, sorted real-time table. */
  def write(rt: DataFrame, table: String, buckets: Int = 32): Unit =
    rt.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "id")
      .sortBy("id", "messageTimestamp")
      .saveAsTable(table)

  /** Append a micro-batch (same bucket spec; Spark validates). */
  def append(rt: DataFrame, table: String): Unit =
    rt.write.mode(SaveMode.Append).insertInto(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /**
   * Compact away expired rows (run periodically; read-time filtering
   * uses the same predicate via IngestPipeline.compactExpired).
   *
   * Stage-then-swap, no caching: live rows stream from the current
   * table into a `_compacting` table (different location — no
   * read/write overlap, nothing pinned in memory), then the swap
   * renames current aside, promotes the staged table, and only then
   * drops the old data. A crash at ANY step leaves a complete copy of
   * the data under `table`, `table_precompact`, or `table_compacting`
   * — never a window with no table (the failure mode of the previous
   * DROP-then-RENAME).
   */
  def compact(spark: SparkSession, table: String, nowEpochS: Long, buckets: Int = 32): Unit = {
    stageCompacted(spark, table, nowEpochS, buckets)
    swapCompacted(spark, table)
  }

  /** Step 1: write live rows to `<table>_compacting` (original untouched;
   * a stale staging table from a prior crash is replaced). */
  private[sources] def stageCompacted(spark: SparkSession, table: String,
      nowEpochS: Long, buckets: Int): Unit = {
    val tmp = table + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    write(graft.streaming.IngestPipeline.compactExpired(spark.table(table), nowEpochS),
      tmp, buckets)
  }

  /** Step 2: old → `<table>_precompact`, staged → `table`, drop old. */
  private[sources] def swapCompacted(spark: SparkSession, table: String): Unit = {
    val tmp = table + "_compacting"
    val old = table + "_precompact"
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"DROP TABLE $old")
  }
}
