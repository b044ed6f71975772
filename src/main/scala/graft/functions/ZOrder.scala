package graft.functions

import graft.functions.expressions.ZOrderInterleave
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns

/**
 * Multi-dimensional data-layout clustering via Z-order (Morton) keys —
 * the warehouse-maintenance step that makes parquet min/max row-group
 * stats prune predicates on SEVERAL columns at once. A table sorted by
 * one column serves only that column's filters; sorted by the
 * interleaved key, every participating dimension gets locality
 * proportional to its bit share, which is the layout Delta/Iceberg's
 * `OPTIMIZE ZORDER BY` produces and the one you want under a 100 TB
 * warehouse queried by both machine and time.
 *
 * Backed by the codegen'd [[ZOrderInterleave]] expression, so key
 * computation stays inside whole-stage codegen in the write path.
 */
object ZOrder {

  /** Z-order key over pre-bucketed non-negative BIGINT columns (each
   * already reduced to `0 .. 2^bits-1`, e.g. via [[bucket]]). */
  def key(bits: Int, cols: Column*): Column =
    GraftColumns.column(ZOrderInterleave(
      cols.map(GraftColumns.expression), bits))

  /** Equi-width bucket of `c` over `[min, max]` into `2^bits` cells —
   * the dimension-reduction in front of [[key]]. Values are clamped
   * into range so stragglers land in the edge cells.
   *
   * All-integral arithmetic: `(c − min) · cells div span` — IEEE
   * double division would lose bucket boundaries once the product
   * exceeds 2^53 (e.g. microsecond timestamps over years), so the
   * quotient is an exact integral divide, out-of-range values
   * short-circuit BEFORE the subtraction (no ANSI overflow on wild
   * inputs), and the one product that remains is bounded by the
   * `require` below: span · 2^bits must fit in a Long — coarser bits
   * or a narrower range otherwise (fail fast, never silent drift). */
  def bucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(max > min, s"need max > min, got [$min, $max]")
    val cells = 1L << bits
    val span = max - min + 1L
    require(span > 0L && BigInt(span) * cells <= BigInt(Long.MaxValue),
      s"span($span) * 2^$bits overflows Long — use fewer bits or a narrower [min, max]")
    val cl = c.cast("long")
    val idiv = GraftColumns.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumns.expression((cl - min) * cells),
        GraftColumns.expression(lit(span))))
    when(cl < min, lit(0L))
      .when(cl > max, lit(cells - 1L))
      .otherwise(idiv)
  }

  /**
   * Rewrite `df` clustered by the Z-order of `dims` (each a
   * pre-bucketed BIGINT column expression): range-partition on the
   * key so each output file owns a compact key interval, sort within
   * partitions so row groups inside a file are compact too, and the
   * min/max footer stats of every file/row-group cover a narrow slice
   * of EVERY participating dimension. `numFiles` sizes the layout
   * (at cluster scale: total bytes / target file size).
   *
   * One range-partitioned sort is the entire cost — the same shape as
   * a single-column sort rewrite; the multi-dimensional pruning is
   * free after that.
   */
  def clusteredWrite(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int, path: String): Unit =
    cluster(df, dims, bits, numFiles)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)

  /** The clustering itself (range-partition + in-partition sort on the
   * Z-key, key dropped) — reusable by any writer, e.g. the warehouse
   * compactor's pluggable layout. */
  def cluster(df: DataFrame, dims: Seq[Column], bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("_zkey", key(bits, dims: _*))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}
