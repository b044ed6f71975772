package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-generated testdata tables (TESTDATA.md) and
 * the canonical telemetry view that maps the generic `events` stream
 * table onto the reference's machine-telemetry shape.
 *
 * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
 * vectorized reader rejects; `spark.sql.legacy.parquet.nanosAsLong`
 * reads it as epoch-nanos Long. The DuckDB oracle reads the same
 * column truncated to microseconds, so all derived time columns here
 * are µs or s granularity to stay engine-portable.
 */
object Tables {

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
    ev.select(
      col("event_id"),
      concat(
        lit("site"), (col("user_id") % 3).cast("string"),
        lit("/area"), (col("user_id") % 2).cast("string"),
        lit("/line"), (col("user_id") % 4).cast("string"),
        lit("/m"), col("user_id").cast("string")).as("machineId"),
      expr("ts div 1000000000").as("es"),
      expr("ts div 1000").as("ts_us"),
      // raw nanos passthrough: the ONLY physical time column, so range
      // predicates phrased on it reach the parquet scan as
      // PushedFilters (P7's coarse-range + residual pattern)
      col("ts").as("ts_ns"),
      timestamp_micros(expr("ts div 1000")).as("timestamp"),
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
      col("ts_us"), col("ts_ns"), col("event_id"))
    val prod = t.select(
      concat(lit("PRODUCTION_COUNT_"), col("machineId")).as("id"),
      col("es").as("messageTimestamp"),
      col("cnt").cast("string").as("value"),
      col("ts_us"), col("ts_ns"), col("event_id"))
    status.unionByName(prod)
  }

  /** DuckDB mirror of [[realTime]] (expects a `telemetry` CTE in scope). */
  val realTimeSql: String =
    """SELECT 'STATUS_' || machineId AS id, es AS messageTimestamp, status AS value, ts_us, ts_ns, event_id FROM telemetry
      |UNION ALL
      |SELECT 'PRODUCTION_COUNT_' || machineId AS id, es AS messageTimestamp, CAST(cnt AS VARCHAR) AS value, ts_us, ts_ns, event_id FROM telemetry""".stripMargin
}
