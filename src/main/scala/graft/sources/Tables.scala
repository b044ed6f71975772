package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/**
 * Loaders for the driver-generated testdata tables (TESTDATA.md) and
 * the canonical telemetry view that maps the generic `events` stream
 * table onto the reference's machine-telemetry shape.
 *
 * `events.ts` has shipped in two physical parquet types across
 * testdata generations: TIMESTAMP(NANOS) — which Spark's vectorized
 * reader only accepts as an epoch-nanos Long via
 * `spark.sql.legacy.parquet.nanosAsLong` — and plain timestamp[us]
 * (TIMESTAMP / TIMESTAMP_NTZ to Spark). Every time-derivation here
 * branches on the ACTUAL physical type at read time, so a testdata
 * regeneration that flips the representation cannot break the views.
 * The DuckDB oracle side uses `epoch_ns(ts)`, which is likewise
 * type-agnostic; derived time columns are µs or s granularity to stay
 * engine-portable. The session time zone is pinned UTC, so the
 * NTZ→instant cast is the identity mapping.
 */
object Tables {

  /** True when the physical `ts` column is temporal (timestamp[us]);
   * false for the epoch-nanos BIGINT representation. Throws a readable
   * error for anything else — the schema-drift tripwire. */
  def tsIsTemporal(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case LongType => false
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other; expected BIGINT (epoch-nanos) or TIMESTAMP[_NTZ]")
  }

  /** Epoch-nanos Long derived from the physical `ts`, whatever its
   * parquet representation. In the Long branch this is the physical
   * column itself (predicates on it reach the scan); in the temporal
   * branch it is derived — use [[tsRawRange]] for pushable ranges. */
  def tsNs(ev: DataFrame): Column =
    if (tsIsTemporal(ev.schema("ts").dataType)) expr("unix_micros(cast(ts as timestamp)) * 1000")
    else col("ts")

  /** Epoch-seconds Long from the physical `ts` (both representations). */
  def tsEs(ev: DataFrame): Column =
    if (tsIsTemporal(ev.schema("ts").dataType)) expr("unix_micros(cast(ts as timestamp)) div 1000000")
    else expr("ts div 1000000000")

  /** Pushable coarse-range predicate `[startSec, endSecExcl)` phrased
   * directly on a PHYSICAL time column (default `ts_raw`, the
   * passthrough in [[telemetry]]/[[realTime]]), with literals matched
   * to its type so the conjunct reaches the parquet scan as
   * PushedFilters — the 100 TB partition-prune + residual pattern. */
  def tsRawRange(df: DataFrame, startSec: Long, endSecExcl: Long, colName: String = "ts_raw"): Column =
    df.schema(colName).dataType match {
      case LongType =>
        col(colName) >= startSec * 1000000000L && col(colName) < endSecExcl * 1000000000L
      case TimestampNTZType =>
        // constant-folds to NTZ literals (session TZ is UTC ⇒ identity)
        col(colName) >= timestamp_seconds(lit(startSec)).cast(TimestampNTZType) &&
          col(colName) < timestamp_seconds(lit(endSecExcl)).cast(TimestampNTZType)
      case TimestampType =>
        col(colName) >= timestamp_seconds(lit(startSec)) &&
          col(colName) < timestamp_seconds(lit(endSecExcl))
      case other => throw new IllegalStateException(
        s"$colName has unsupported physical type $other for a time-range predicate")
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /**
   * Canonical telemetry view: each event becomes one machine reading.
   *
   *  - machineId: `site{u%3}/area{u%2}/line{u%4}/m{u}` — a 4-token
   *    alias matching the reference's site/area/process/machine shape
   *    so location/line derivation (tokens 0/1 and 2) is exercised.
   *  - status: event_type decoded to the reference's MachineStatus
   *    domain (error→DOWN, purchase/click→UP, view/signup→IDLE).
   *  - cnt: the production counter, floor(value*100) as Long.
   *  - es / ts_us: epoch seconds / microseconds; `timestamp` the µs
   *    TimestampType form.
   */
  def telemetry(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.withColumn("ts_ns", tsNs(ev))
      .select(
        col("event_id"),
        concat(
          lit("site"), (col("user_id") % 3).cast("string"),
          lit("/area"), (col("user_id") % 2).cast("string"),
          lit("/line"), (col("user_id") % 4).cast("string"),
          lit("/m"), col("user_id").cast("string")).as("machineId"),
        expr("ts_ns div 1000000000").as("es"),
        expr("ts_ns div 1000").as("ts_us"),
        col("ts_ns"),
        // physical passthrough: the column range predicates must be
        // phrased on (via [[tsRawRange]]) to reach the parquet scan as
        // PushedFilters (P7's coarse-range + residual pattern)
        col("ts").as("ts_raw"),
        timestamp_micros(expr("ts_ns div 1000")).as("timestamp"),
        when(col("event_type") === "error", "DOWN")
          .when(col("event_type").isin("purchase", "click"), "UP")
          .otherwise("IDLE").as("status"),
        floor(col("value") * 100).cast("long").as("cnt"),
        lit("GOOD").as("quality"))
  }

  /** The matching DuckDB CTE body for [[telemetry]] — kept adjacent so
   * the two definitions stay in lockstep. */
  val telemetrySql: String =
    """SELECT event_id,
      |  'site' || CAST(user_id % 3 AS VARCHAR) || '/area' || CAST(user_id % 2 AS VARCHAR) ||
      |  '/line' || CAST(user_id % 4 AS VARCHAR) || '/m' || CAST(user_id AS VARCHAR) AS machineId,
      |  epoch_ns(ts) // 1000000000 AS es,
      |  epoch_ns(ts) // 1000 AS ts_us,
      |  epoch_ns(ts) AS ts_ns,
      |  ts AS ts_raw,
      |  CASE event_type WHEN 'error' THEN 'DOWN'
      |       WHEN 'purchase' THEN 'UP' WHEN 'click' THEN 'UP'
      |       ELSE 'IDLE' END AS status,
      |  CAST(floor(value*100) AS BIGINT) AS cnt,
      |  'GOOD' AS quality
      |FROM events""".stripMargin

  /**
   * The real-time fact table derived from telemetry: two series per
   * machine (`STATUS_` decoded status values, `PRODUCTION_COUNT_`
   * stringified counters) keyed like the reference's DynamoDB table
   * (appsync-api-construct.ts:51-59).
   */
  def realTime(spark: SparkSession, sfDir: String): DataFrame = {
    val t = telemetry(spark, sfDir)
    val status = t.select(
      concat(lit("STATUS_"), col("machineId")).as("id"),
      col("es").as("messageTimestamp"),
      col("status").as("value"),
      col("ts_us"), col("ts_ns"), col("ts_raw"), col("event_id"))
    val prod = t.select(
      concat(lit("PRODUCTION_COUNT_"), col("machineId")).as("id"),
      col("es").as("messageTimestamp"),
      col("cnt").cast("string").as("value"),
      col("ts_us"), col("ts_ns"), col("ts_raw"), col("event_id"))
    status.unionByName(prod)
  }

  /** DuckDB mirror of [[realTime]] (expects a `telemetry` CTE in scope). */
  val realTimeSql: String =
    """SELECT 'STATUS_' || machineId AS id, es AS messageTimestamp, status AS value, ts_us, ts_ns, ts_raw, event_id FROM telemetry
      |UNION ALL
      |SELECT 'PRODUCTION_COUNT_' || machineId AS id, es AS messageTimestamp, CAST(cnt AS VARCHAR) AS value, ts_us, ts_ns, ts_raw, event_id FROM telemetry""".stripMargin
}
