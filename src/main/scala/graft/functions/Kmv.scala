package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values / bottom-k) distinct-count sketch (Bar-Yossef
 * et al. 2002; the theta-sketch construction) — the set-algebra
 * member of the mergeable-sketch family: where [[Hll]] only counts a
 * set, KMV sketches COMPOSE — the union of two sketches is the
 * bottom-k of their union, so |A∪B| is estimated directly and |A∩B|
 * falls out by inclusion-exclusion. "How many users appear in BOTH
 * day A and day B" at warehouse scale, from two k-row sketches.
 *
 * Spark-first and engine-portable like its siblings: a sketch is just
 * the k smallest distinct [[Dedup.md5Hash32]] values per group —
 * plain rows, built with a rank window that WindowGroupLimit prunes;
 * merge is union→distinct→re-rank (idempotent AND commutative, so a
 * streaming store needs no replay bookkeeping — [[graft.streaming.StreamingHll]]'s
 * property, not the histogram's). The estimator is the classic
 * (k−1)/θ with θ = h_(k)/2^32 — one exact integer ratio per group,
 * reproduced by a DuckDB oracle to the last bit.
 */
object Kmv {

  /** 2^32 as double — md5Hash32's value space, the θ normalizer. */
  val HashSpace: Double = 4294967296.0

  /** Bottom-k sketch: `(groupCols..., h)` rows, ≤ k per group, h the
   * distinct 32-bit hashes in ascending rank. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      k: Int = 256): DataFrame = {
    require(k > 0, s"need positive k, got $k")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    // null values are SKIPPED (the HllSketchAgg contract) — a null
    // hash would otherwise sort first and burn a sketch slot
    df.select(g :+ Dedup.md5Hash32(valueCol).as("h"): _*)
      .filter(col("h").isNotNull)
      .distinct()
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Merge sketches keyed by `groupCols` (e.g. day sketches rolled to
   * a month, or two sides unioned for set algebra): bottom-k of the
   * union — same row shape, composable further. With empty
   * `groupCols` the rank window is global (SinglePartition), which is
   * FINE here by construction: the input is sketch rows, bounded at
   * #input-groups × k, never data-sized. */
  def merge(sketches: DataFrame, groupCols: Seq[String], k: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    sketches.select(g :+ col("h"): _*)
      .distinct()
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /**
   * Distinct estimate per group: exact count when the sketch holds
   * fewer than k hashes (the sketch IS the distinct set), else
   * (k−1)/θ with θ = h_max/2^32 — h_max is the k-th minimum itself,
   * so exactly k−1 retained hashes lie STRICTLY below θ: the standard
   * theta-sketch convention, shared with [[intersectEstimate]] so the
   * two estimators are mutually consistent. Deterministic double
   * arithmetic both engines share. Output: (groupCols..., n_hashes,
   * estimate).
   */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    sk.groupBy(g: _*)
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("_hmax"))
      .select(g :+ col("n_hashes") :+
        when(col("n_hashes") < k, col("n_hashes").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("_hmax").cast("double") / HashSpace)).as("estimate"): _*)
  }

  /**
   * Direct θ-intersection estimate for every unordered pair of groups
   * — the theta-sketch intersection (Dasgupta et al., "Theta
   * sketches"): restrict both sketches to the SHARED sampling
   * threshold θ = min(θ_A, θ_B) and count surviving common hashes;
   * `|A∩B| ≈ n_common/θ`. Strictly better than o14's
   * inclusion-exclusion when the intersection is small relative to
   * the union (there the estimate is a difference of three large
   * noisy numbers; here it is a direct count). θ is carried in EXACT
   * integer hash space (2³² for an exact sketch, h_max — the k-th
   * minimum, strictly-below counting, [[estimate]]'s convention — at
   * capacity), so the one float op is the final division —
   * bit-reproducible cross-engine like [[estimate]].
   *
   * Output: one row per unordered group pair (ga < gb) — including
   * zero-overlap pairs — with n_common and the estimate. Scale shape:
   * the equi-join on h touches only sketch rows (≤ #groups·k), the
   * pair grid is #groups² — never data-sized; the estimate of a 100 TB
   * cross-source overlap reads two k-row sketches.
   */
  def intersectEstimate(sk: DataFrame, groupCol: String, k: Int = 256): DataFrame = {
    require(k > 0, s"need positive k, got $k")
    val th = sk.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hmax"))
      .select(col(groupCol),
        when(col("_n") < k, lit(4294967296L))
          .otherwise(col("_hmax")).as("theta_i"))
    val ta = th.select(col(groupCol).as("ga"), col("theta_i").as("_ta"))
    val tb = th.select(col(groupCol).as("gb"), col("theta_i").as("_tb"))
    // complete unordered pair grid (groups × groups — tiny, broadcast)
    val grid = ta.join(tb, col("ga") < col("gb"))
      .select(col("ga"), col("gb"), least(col("_ta"), col("_tb")).as("theta_min_i"))
    // count only common hashes below the SHARED threshold — a hash in
    // A's exact region but above B's θ is not a valid joint sample
    val commonBelow = sk.select(col(groupCol).as("ga"), col("h"))
      .join(sk.select(col(groupCol).as("gb"), col("h")), Seq("h"))
      .filter(col("ga") < col("gb"))
      .join(broadcast(grid), Seq("ga", "gb"))
      .filter(col("h") < col("theta_min_i"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_common"))
    grid.join(commonBelow, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("theta_min_i").cast("double") / HashSpace)).as("estimate"))
  }
}
