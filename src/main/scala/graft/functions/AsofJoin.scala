package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join — for each left row, the latest right value
 * whose timestamp is at-or-before the left row's timestamp, per key.
 * The join sensor/telemetry pipelines run constantly ("which status
 * was in effect when this reading arrived") and one of the classic
 * operators Spark has no built-in for.
 *
 * Spark-first formulation: instead of a per-row range probe (which
 * plans as a broadcast-nested-loop or range join and dies at scale),
 * UNION the two sides, sort within each key partition by (ts, side),
 * and carry the last right ROW forward with an ordered window
 * (`last(_, ignoreNulls)` over unboundedPreceding..current).
 * Cost: ONE shuffle on the key — the same partitioning both inputs
 * would need anyway — and a per-partition sort; no row explosion at
 * any skew. Right rows sort BEFORE left rows at equal timestamps, so
 * the match is inclusive (`right.ts <= left.ts`), exactly DuckDB's
 * `ASOF JOIN ... ON l.ts >= r.ts` semantics (the x2 oracle).
 *
 * NULL contract: what is carried is a (marker, value) STRUCT, not the
 * bare value — `ignoreNulls` then skips only the union's left-row
 * placeholders, never a right row whose VALUE is legitimately NULL.
 * A NULL right value therefore propagates as NULL until the next
 * right row, exactly like DuckDB's ASOF join (which matches the row
 * and returns its NULL), instead of silently reading as "no update".
 *
 * Determinism: callers should ensure at most one right row per
 * (key, ts) — dedupe with a keep-latest agg first (the j7 shape). If
 * duplicates remain, the greatest (value NULLs first) at equal ts
 * wins (the `_rv` struct ordering term), which is still
 * deterministic.
 */
object AsofJoin {

  /**
   * @param left      fact side (all columns preserved)
   * @param right     lookup side: exactly (keyCol, rightTs, valueCol)
   *                  are consulted
   * @param keyCol    equi-join key present on both sides
   * @param leftTs    left timestamp column (any orderable numeric)
   * @param rightTs   right timestamp column, same domain as leftTs
   * @param valueCol  right column to carry
   * @param asofCol   output column name for the carried value
   */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCol: String,
      asofCol: String = "asof_value"): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val valueType = right.schema(valueCol).dataType
    val carryType = StructType(Seq(
      StructField("m", BooleanType, nullable = false),
      StructField("v", valueType)))
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_rv", lit(null).cast(carryType))
    val r = right.select(
      col(keyCol),
      col(rightTs).as("_asof_ts"),
      lit(0).as("_asof_side"),
      struct(lit(true).as("m"), col(valueCol).as("v")).as("_asof_rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_asof_ts"), col("_asof_side"), col("_asof_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol,
        last(col("_asof_rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("_asof_side") === 1)
      .drop("_asof_ts", "_asof_side", "_asof_rv")
  }

  /**
   * As-of join with a match TOLERANCE — the telemetry-native variant:
   * the latest right row at-or-before the left row matches only while
   * it is at most `maxGap` old (same units as the timestamp columns);
   * a staler match reads as NULL ("no status in effect"), which is
   * how a monitoring pipeline must treat a machine that stopped
   * reporting. Same one-shuffle union + ordered-carry plan as
   * [[asof]] — the carried struct additionally holds the right
   * timestamp, and the gap test runs AFTER the carry, so the window
   * shape (and its cost) is unchanged. The latest match is also the
   * nearest, so "latest within gap" equals "nearest within gap".
   * NULL contract as [[asof]]: a right row whose VALUE is NULL but
   * whose timestamp is within the gap still matches (NULL value, not
   * "no match").
   */
  def asofWithin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCol: String, maxGap: Long,
      asofCol: String = "asof_value"): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val valueType = right.schema(valueCol).dataType
    val tsType = right.schema(rightTs).dataType
    val carryType = StructType(Seq(
      StructField("m", BooleanType, nullable = false),
      StructField("t", tsType),
      StructField("v", valueType)))
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_rv", lit(null).cast(carryType))
    val r = right.select(
      col(keyCol),
      col(rightTs).as("_asof_ts"),
      lit(0).as("_asof_side"),
      struct(lit(true).as("m"), col(rightTs).as("t"),
        col(valueCol).as("v")).as("_asof_rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_asof_ts"), col("_asof_side"), col("_asof_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("_asof_rv"), ignoreNulls = true).over(w)
    unioned
      .withColumn(asofCol,
        when(col(leftTs) - carried.getField("t") <= maxGap,
          carried.getField("v")))
      .filter(col("_asof_side") === 1)
      .drop("_asof_ts", "_asof_side", "_asof_rv")
  }
}
