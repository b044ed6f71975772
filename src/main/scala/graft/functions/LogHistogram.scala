package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable log-scaled histogram sketch for non-negative LONG metrics
 * (durations, sizes, counts) — the 100 TB path to percentile
 * dashboards, complementing the exact-population percentiles (x18)
 * that are right when the key space is small:
 *
 *  - a value's bin is `(bit length, top SubBits mantissa bits)` —
 *    PURE integer arithmetic (no ln/log2 float anywhere, the same
 *    engine-portability rule as [[expressions.HllSketch]]), fully
 *    inside whole-stage codegen;
 *  - values 0..15 get EXACT bins; above that the bin's relative width
 *    is ≤ 2^-SubBits (12.5 %), the DDSketch-style guarantee;
 *  - the sketch IS rows `(group, bin, n)` — at most ~488 bins per
 *    group regardless of input size, so a per-(day, line) sketch
 *    store is tiny, and MERGE is plain additive union (`groupBy` +
 *    `sum` — commutative/associative, any engine);
 *  - quantile read-out walks the cumulative counts and returns the
 *    bin's LOWER BOUND — deterministic integers, so the DuckDB oracle
 *    matches by hash, not approximately.
 */
object LogHistogram {

  /** Mantissa bits kept below the leading 1-bit. */
  val SubBits = 3
  private val SubCount = 1 << SubBits // 8

  import org.apache.spark.sql.graftshim.GraftColumns
  // column-shift variants (the functions API only takes literal Ints)
  private def shr(v: Column, n: Column): Column =
    GraftColumns.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      GraftColumns.expression(v), GraftColumns.expression(n)))
  private def shl(v: Column, n: Column): Column =
    GraftColumns.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      GraftColumns.expression(v), GraftColumns.expression(n)))

  /**
   * Bin id of a non-negative long Column. Contiguous and
   * order-preserving: v in 0..(2·SubCount−1) maps to itself;
   * above that id = (bitlen − SubBits − 1)·SubCount + top (SubBits+1)
   * bits. `length(bin(v))` is the exact integer bit length (codegen'd
   * string length of the binary repr — no float log anywhere).
   */
  def binId(v: Column): Column = {
    val bitlen = length(bin(v))
    when(v < lit(2L * SubCount), v)
      .otherwise(
        (bitlen - (SubBits + 1)).cast("long") * SubCount +
          shr(v, (bitlen - (SubBits + 1)).cast("int")))
  }

  /** Inclusive lower bound of a bin id (the quantile representative).
   * Exact inverse of [[binId]]'s floor. */
  def binLowerBound(id: Column): Column = {
    val e = shr(id.cast("long"), lit(SubBits)) // id div 8, exact integral
    val m = pmod(id.cast("long"), lit(SubCount.toLong))
    when(id < lit(2L * SubCount), id.cast("long"))
      .otherwise(shl(lit(SubCount.toLong) + m, (e - 1L).cast("int")))
  }

  /** The sketch: per-group bin counts — `(groupCols..., bin, n)`.
   * This is the STORED, mergeable form; re-aggregating sketches from
   * finer groups (days → month) is `groupBy(bin).sum(n)`. */
  def sketch(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame =
    df.groupBy(groupCols :+ binId(valueCol).as("bin"): _*)
      .agg(count(lit(1)).as("n"))

  /**
   * Quantile read-out: for each requested q, the lower bound of the
   * first bin whose cumulative count reaches ⌈q·total⌉ — the exact
   * integer definition both engines implement identically. One
   * window pass over the (tiny) per-group bin rows.
   * Output: (groupCols..., q, value).
   */
  def quantiles(sketch: DataFrame, groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(g: _*)
    // ONE pass: explode the q list onto the (tiny) cum rows instead of
    // a per-q union — a union of filtered branches would re-execute
    // the sketch's whole upstream lineage once per quantile, which at
    // warehouse scale means re-scanning the fact table |qs| times.
    // The rank threshold ⌈q·total⌉ stays exact-integer: the float
    // only scales the total, never compares two derived floats.
    sketch
      .withColumn("_cum", sum(col("n")).over(w))
      .withColumn("_tot", sum(col("n")).over(wAll))
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .filter(col("_cum") >= ceil(col("_tot") * col("q")).cast("long"))
      .groupBy(g :+ col("q"): _*)
      .agg(min(col("bin")).as("_bin"))
      .select(g :+ col("q") :+ binLowerBound(col("_bin")).as("value"): _*)
  }
}
