package graft.streaming

import graft.model.MachineStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Continuous (streaming) variant of the interval condensation — the
 * alternative SURVEY §2.8 leaves open: instead of condensing at query
 * time over the real-time table, maintain the one-minute chunks as a
 * windowed streaming aggregation with a watermark for late data.
 *
 * Window identity matches the batch form: a chunk is identified by its
 * END timestamp and a row exactly on a minute boundary belongs to the
 * EARLIER chunk — achieved by windowing over `ts - 1µs`.
 *
 * The reference itself has no watermark (writes unconditionally, TTL
 * retention); this form trades its any-time recompute for bounded
 * state: chunks finalize `allowedLateness` after their end.
 */
object StreamingCondense {

  /**
   * statusStream columns: machineId (string), ts (timestamp), value
   * (string). Emits per (machineId, chunk): dataAsOfUTCUnixTimestamp,
   * statusValue (DOWN-dominant-last, same rule as the batch path).
   * Append-mode compatible (finalized on watermark passage).
   */
  def condenseStatusStream(statusStream: DataFrame, allowedLateness: String = "2 minutes"): DataFrame =
    statusStream
      // shift BEFORE the watermark: the watermark column must be the
      // one the window groups on
      .withColumn("_ts_shift", col("ts") - expr("INTERVAL 1 MICROSECOND"))
      .withWatermark("_ts_shift", allowedLateness)
      .groupBy(col("machineId"), window(col("_ts_shift"), "1 minute").as("_w"))
      .agg(
        max(col("value") === MachineStatus.Down).as("_anyDown"),
        max_by(col("value"), struct(col("ts"), col("value"))).as("_last"))
      .select(
        col("machineId"),
        unix_timestamp(col("_w.end")).as("dataAsOfUTCUnixTimestamp"),
        when(col("_anyDown"), MachineStatus.Down).otherwise(col("_last")).as("statusValue"))
}
