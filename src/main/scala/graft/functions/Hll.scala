package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.GraftColumns

import graft.functions.expressions.{HllMergeAgg, HllSketchAgg, HllStats}

/**
 * Column API over the deterministic mergeable HLL sketch
 * ([[graft.functions.expressions.HllSketch]]) — the incremental
 * distinct-counting workflow:
 *
 * {{{
 * // nightly: one 1 KiB sketch per (source, day), stored
 * df.groupBy($"source", $"day").agg(Hll.sketch($"user_id".cast("string")).as("sk"))
 * // any read: distinct over an arbitrary day range, no rescan
 * store.where(...).groupBy($"source").agg(Hll.merge($"sk").as("sk"))
 *   .select($"source", Hll.stats($"sk").as("st"))
 * }}}
 *
 * The child of [[sketch]] must already be a STRING — the cast
 * formatting is part of the hash contract (the DuckDB oracle hashes
 * `CAST(x AS VARCHAR)` of the same value).
 */
object Hll {

  /** Aggregate STRING values into a 1024-byte register sketch. */
  def sketch(c: Column): Column =
    GraftColumns.column(
      HllSketchAgg(GraftColumns.expression(c)).toAggregateExpression())

  /** Aggregate stored sketches into their register-max union. */
  def merge(c: Column): Column =
    GraftColumns.column(
      HllMergeAgg(GraftColumns.expression(c)).toAggregateExpression())

  /** Sketch → struct(v, s, estimate): zero registers, exact harmonic
   * sum, corrected cardinality estimate. */
  def stats(c: Column): Column =
    GraftColumns.column(HllStats(GraftColumns.expression(c)))
}
