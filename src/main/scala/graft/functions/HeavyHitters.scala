package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frequent-item detection WITHOUT a full-key shuffle — the missing
 * piece between the Count-Min sketch (approximate counts for KNOWN
 * probes) and `groupBy.count` (exact, but shuffles every distinct
 * key): find every value whose frequency is at least `phi` of the
 * stream, with EXACT counts, when the distinct-key space is too large
 * to shuffle.
 *
 * Two passes, both memory-bounded:
 *
 *  1. **Candidates** — per-partition Misra-Gries (1982) summaries
 *     with m = ⌈slack/phi⌉ counters inside `mapPartitions` (fixed
 *     memory per task, no shuffle of the key space). The weighted
 *     pigeonhole guarantee: an item with global count ≥ phi·n has,
 *     in at least one partition, count ≥ phi·n_p — and per-partition
 *     MG with m ≥ 1/phi counters never evicts such an item to zero
 *     at the end of the pass, so the candidate union is a SUPERSET
 *     of the true heavy hitters. Candidates are ≤ m per partition.
 *  2. **Verify** — exact counts of the candidate set only: one
 *     broadcast semi-join + an aggregation over candidate keys
 *     (bounded by m·partitions, not by distinct keys), then the
 *     exact threshold filter.
 *
 * Because pass 2 is exact and pass 1 cannot miss, the OUTPUT is
 * bit-identical to the naive `GROUP BY HAVING count ≥ ⌈phi·n⌉` — the
 * approximation machinery is invisible in the result, so a plain SQL
 * oracle checks it exactly (query t38). At 100 TB the win is the
 * shuffle: only ~m·partitions candidate keys move, never the
 * billions of distinct tokens.
 */
object HeavyHitters {

  /**
   * Values of `valueCol` (string) with exact count ≥ ⌈phi·n⌉, as
   * `(value, n)`. `slack` multiplies the per-partition counter budget
   * above the 1/phi minimum (more counters = smaller residual error,
   * never needed for correctness — 1 suffices for the superset
   * guarantee; the default leaves margin for pathological orderings).
   */
  def aboveFraction(df: DataFrame, valueCol: Column, phi: Double,
      slack: Int = 4): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    require(slack >= 1, s"slack must be >= 1, got $slack")
    val spark = df.sparkSession
    import spark.implicits._
    val m = math.max(1, math.ceil(slack / phi).toInt)
    val values = df.select(valueCol.cast("string").as("v")).filter(col("v").isNotNull)

    // pass 1: per-partition Misra-Gries — fixed m counters per task.
    // The partition's row count rides along (np ≥ 0 rows; candidates
    // carry np = -1), so the global n needs NO extra scan of the
    // data: two data passes total, candidates and verify.
    val summaries = values.as[String].mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](m * 2)
      var np = 0L
      it.foreach { v =>
        np += 1L
        val cur = counters.get(v)
        if (cur != null) counters.put(v, cur + 1L)
        else if (counters.size < m) counters.put(v, java.lang.Long.valueOf(1L))
        else {
          // decrement-all: O(m) amortized over the m inserts it absorbs
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().asScala.iterator.map(k => (k, -1L)) ++ Iterator(("", np))
    }.toDF("v", "np").localCheckpoint(true) // tiny: ≤ (m+1)·partitions rows

    val n = summaries.filter(col("np") >= 0L).agg(sum(col("np"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val candidates = summaries.filter(col("np") === -1L).select(col("v")).distinct()

    // pass 2: exact recount of candidates only, then the exact gate
    val threshold = math.ceil(phi * n).toLong
    values.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
