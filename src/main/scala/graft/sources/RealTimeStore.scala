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

  /** Compact away expired rows (run periodically; read-time filtering
   * uses the same predicate via IngestPipeline.compactExpired). */
  def compact(spark: SparkSession, table: String, nowEpochS: Long, buckets: Int = 32): Unit = {
    val live = graft.streaming.IngestPipeline.compactExpired(spark.table(table), nowEpochS)
      .cache()
    live.count() // materialize before overwrite reads the same table
    val tmp = table + "_compacting"
    write(live, tmp, buckets)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    live.unpersist()
  }
}
