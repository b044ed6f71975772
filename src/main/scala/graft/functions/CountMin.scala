package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency
 * side of the mergeable-sketch family ([[Hll]] distinct counts,
 * [[LogHistogram]] quantiles): approximate per-item counts over a
 * domain too large to materialize, in `depth × width` integer
 * counters regardless of input size. "How often does each token /
 * domain / machine appear" at 100 TB without shuffling the raw values
 * anywhere — the sketch rows are the only thing that moves.
 *
 * Spark-first construction: the sketch IS a DataFrame of
 * `(groupCols..., d, bucket, n)` rows built by one explode(depth) +
 * one aggregation — no custom expression needed, every hash is the
 * engine-portable [[Dedup.md5Hash32]] over a salted value, so a
 * DuckDB oracle reproduces every counter exactly. Merging sketches
 * (days → month) is additive union, like [[LogHistogram]]; replays
 * under streaming need the same batch-stamp collapse
 * ([[graft.streaming.StreamingLogHistogram]]'s contract), NOT
 * [[graft.streaming.StreamingHll]]'s in-place merge.
 *
 * Estimates are deterministic and one-sided: est ≥ true count always
 * (collisions only ADD), with overshoot bounded by ~2·N/width at
 * depth ≥ ln(1/δ) — the classic guarantee.
 */
object CountMin {

  private def bucketOf(d: Column, v: Column, width: Int): Column =
    pmod(Dedup.md5Hash32(concat(d.cast("string"), lit(":"), v)), lit(width.toLong))

  /** Build the sketch: `(groupCols..., d, bucket, n)` — at most
   * depth·width rows per group. */
  def sketch(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth/$width")
    // null values are SKIPPED (the HllSketchAgg contract) — they would
    // otherwise land in a null bucket row and skew nothing useful
    df.filter(valueCol.isNotNull)
      .withColumn("_d", explode(array((0 until depth).map(lit(_)): _*)))
      .groupBy(groupCols :+ col("_d").as("d")
        :+ bucketOf(col("_d"), valueCol, width).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Point estimates for probe values: min over the depth counters
   * each probe hashes to. `probes` carries one row per value to look
   * up (any other columns ride along); output appends `est`.
   * The join is (groupCols..., d, bucket)-keyed against the
   * depth·width-per-group sketch — broadcast-sized for any realistic
   * configuration.
   *
   * `groupCols` MUST name the group columns the sketch was built with
   * (by the names they carry in the sketch), and `probes` must carry
   * the same columns: a probe only reads counters from its OWN group.
   * Joining a multi-group sketch on (d, bucket) alone would let a
   * probe match counter rows from every group, and the min could dip
   * BELOW the item's true count in its group — silently breaking the
   * one-sided est ≥ true guarantee. The schema `require` makes a
   * mismatched sketch fail loud instead of undercounting.
   */
  def estimate(sk: DataFrame, probes: DataFrame, valueCol: Column,
      depth: Int = 4, width: Int = 1024, groupCols: Seq[String] = Nil): DataFrame = {
    val expected: Seq[String] = groupCols ++ Seq("d", "bucket", "n")
    require(sk.columns.toSeq.sorted == expected.sorted,
      s"sketch columns (${sk.columns.mkString(",")}) must be exactly " +
        s"(${expected.mkString(",")}) — pass the sketch's group columns via groupCols")
    groupCols.foreach(g => require(probes.columns.contains(g),
      s"probes must carry group column '$g' to estimate within its group"))
    val keyed = probes
      .withColumn("_d", explode(array((0 until depth).map(lit(_)): _*)))
      .withColumn("_bucket", bucketOf(col("_d"), valueCol, width))
    keyed
      .join(broadcast(sk.select(groupCols.map(col)
        :+ col("d").as("_d") :+ col("bucket").as("_bucket") :+ col("n").as("_n"): _*)),
        groupCols ++ Seq("_d", "_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("_n"), lit(0L))).as("est"))
  }
}
