package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/**
 * Scale-safe GLOBAL row numbering (O3: deterministic name-or-id sort
 * surfaced as a rank; reference sorts its machine/config lists
 * client-side — ui-reference-construct resolvers).
 *
 * A global `row_number().over(Window.orderBy(...))` funnels every row
 * through ONE task — the classic single-partition scale-killer. This
 * is the standard two-pass alternative: a range-partitioned parallel
 * sort (Spark's `orderBy` = TakeOrderedAndProject-free Exchange
 * rangepartitioning + per-partition sort), then `zipWithIndex`, which
 * computes per-partition counts in one tiny O(#partitions) job and
 * assigns contiguous offsets per partition without moving data again.
 * Every stage is parallel; no Window operator exists in the plan.
 *
 * The sort columns must form a total order (include a tiebreaker key)
 * for the rank to be deterministic.
 */
object GlobalRank {

  /** Append a 1-based global rank column ordered by `sortCols`. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }
}
