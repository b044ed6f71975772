package graft.query

import graft.model.{MachineStatus, MsgType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Interval condensation — the reference's flagship interactive query
 * `getRealTimeMachineData` (data-sources/machine-detail.ts:12-67),
 * re-expressed as a declarative Spark aggregation.
 *
 * Semantics pinned by the reference's golden tests
 * (data-sources/test/machine-detail.spec.ts:159-277):
 *  - the response is a spine of one-minute chunks identified by their
 *    END timestamp, from floor(start,minute)+1min through end;
 *  - a row belongs to the FIRST chunk whose end >= its timestamp, so a
 *    row exactly on a minute boundary belongs to the EARLIER chunk;
 *  - status chunk value = last status in the chunk, except DOWN is
 *    sticky: any DOWN in the chunk makes the chunk DOWN;
 *  - production chunk value = last production count in the chunk;
 *  - empty chunks are UNKNOWN / '' ; rows past the last chunk end are
 *    dropped.
 *
 * Scale notes: chunk assignment is pure integer arithmetic on the
 * epoch-seconds column (no join against the spine to assign — the
 * spine is only left-joined at the end for empty-chunk fill). The
 * aggregation is a hash agg keyed on (machineId, chunk) with map-side
 * partial aggregation; the spine join broadcasts when the time range
 * is bounded (720 chunks for the dashboard's 12h lookback).
 */
object MachineDetail {

  /** floor to minute, in epoch seconds. */
  def floorMinute(epochS: Long): Long = math.floorDiv(epochS, 60L) * 60L

  /** Chunk assignment: first minute boundary >= ts, clamped to the first
   * chunk end (rows between chunkStart and chunkStart+60 all land in the
   * first chunk — machine-detail.ts:39-41). Pure integer arithmetic. */
  def chunkEndCol(epochS: Column, chunkStartS: Long): Column =
    greatest(floor((epochS + 59L) / 60L) * 60L, lit(chunkStartS + 60L)).cast(LongType)

  /** The chunk spine as a DataFrame of `chunk_ts: Long` — one row per
   * minute END in (floor(start,min), end]. */
  def chunkSpine(realTime: DataFrame, startS: Long, endS: Long): DataFrame = {
    val spark = realTime.sparkSession
    val first = floorMinute(startS) + 60L
    spark.range(1).select(explode(sequence(lit(first), lit(endS), lit(60L))).as("chunk_ts"))
  }

  private def machineIdFromSeries(id: Column): Column =
    when(id.startsWith(s"${MsgType.Status}_"), id.substr(lit(MsgType.Status.length + 2), length(id)))
      .otherwise(id.substr(lit(MsgType.ProductionCount.length + 2), length(id)))

  /**
   * Condense the real-time table for ALL machines over [start, end].
   *
   * `realTime` columns: id (STATUS_mid | PRODUCTION_COUNT_mid),
   * messageTimestamp (epoch s), value (string). Returns one row per
   * (machineId, chunk): `machineId, dataAsOfUTCUnixTimestamp,
   * statusValue, productionCountValue`.
   */
  def condenseAll(realTime: DataFrame, startS: Long, endS: Long): DataFrame =
    condenseImpl(realTime, startS, endS, machinesOverride = None)

  private def condenseImpl(realTime: DataFrame, startS: Long, endS: Long,
      machinesOverride: Option[Seq[String]]): DataFrame = {
    val chunkStart = floorMinute(startS)
    val lastEnd = floorMinute(endS) // last chunk end <= endS
    val inRange = realTime
      .filter(col("messageTimestamp").between(chunkStart, lastEnd))
      .withColumn("_mid", machineIdFromSeries(col("id")))
      .withColumn("_chunk", chunkEndCol(col("messageTimestamp"), chunkStart))

    // Deterministic "last in chunk": order by (ts, value) so equal-second
    // rows break ties identically in any engine. Status and production
    // series are condensed in ONE grouped pass (conditional aggregates
    // with null keys ignored by max_by/max) — a single shuffle on
    // (machineId, chunk) and a single spine join.
    val isStatus = col("id").startsWith(s"${MsgType.Status}_")
    val lastKey = struct(col("messageTimestamp"), col("value"))

    val agg = inRange
      .groupBy(col("_mid"), col("_chunk"))
      .agg(
        max(when(isStatus, col("value") === MachineStatus.Down)).as("_anyDown"),
        max_by(when(isStatus, col("value")), when(isStatus, lastKey)).as("_lastStatus"),
        max_by(when(!isStatus, col("value")), when(!isStatus, lastKey)).as("_prodValue"))
      .select(col("_mid").as("_a_mid"), col("_chunk").as("_a_chunk"),
        when(col("_anyDown"), MachineStatus.Down).otherwise(col("_lastStatus")).as("_statusValue"),
        col("_prodValue"))

    // The interactive query pre-populates its spine regardless of data
    // (machine-detail.ts:21-26); the all-machines batch form derives the
    // machine set from the rows in range.
    val spark = realTime.sparkSession
    import spark.implicits._
    val machines = machinesOverride match {
      case Some(mids) => mids.toDF("_mid")
      case None => inRange.select(col("_mid")).distinct()
    }
    val spine = machines.crossJoin(broadcast(chunkSpine(realTime, startS, endS)))

    spine
      .join(agg, col("_mid") === col("_a_mid") && col("chunk_ts") === col("_a_chunk"), "left_outer")
      .select(
        col("_mid").as("machineId"),
        col("chunk_ts").as("dataAsOfUTCUnixTimestamp"),
        coalesce(col("_statusValue"), lit(MachineStatus.Unknown)).as("statusValue"),
        coalesce(col("_prodValue"), lit("")).as("productionCountValue"))
  }

  /** Single-machine variant — the exact GraphQL query surface
   * (`getRealTimeMachineData(id, start, end)`). Filters first so the
   * scan prunes to one series before any aggregation. */
  def realTimeMachineData(realTime: DataFrame, machineId: String, startS: Long, endS: Long): DataFrame = {
    val keys = Seq(s"${MsgType.Status}_$machineId", s"${MsgType.ProductionCount}_$machineId")
    condenseImpl(realTime.filter(col("id").isin(keys: _*)), startS, endS,
      machinesOverride = Some(Seq(machineId)))
      .drop("machineId")
      .orderBy("dataAsOfUTCUnixTimestamp")
  }

  /**
   * Incremental-refresh chunk merge — the dashboard's 60-second re-pull
   * (web-ui MachineDetail.tsx:79-91): every refreshed chunk REPLACES
   * the prior chunk with the same `dataAsOfUTCUnixTimestamp`; prior
   * chunks outside the refreshed window survive. Declarative form of
   * the UI's findIndex/splice/push loop: prior ANTI-JOIN refreshed on
   * the chunk ts, union refreshed. The anti-join broadcasts (chunk sets
   * are spine-sized — ≤720 rows for the 12 h dashboard lookback).
   */
  def mergeChunks(priorChunks: DataFrame, refreshedChunks: DataFrame): DataFrame =
    priorChunks
      .join(broadcast(refreshedChunks.select(col("dataAsOfUTCUnixTimestamp"))),
        Seq("dataAsOfUTCUnixTimestamp"), "left_anti")
      .unionByName(refreshedChunks)
}
