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

  // Registry of the sorted lineages persisted by the two-pass methods.
  // The persist is load-bearing WHILE the caller's action runs (it is
  // what keeps the range-partitioned sort from executing twice), so it
  // cannot be dropped inside the method — but RDD-level persists are
  // invisible to `spark.catalog.clearCache()`, and without a handle a
  // long-lived session (bench loops, Verify sweeps) pins one cached
  // sort output per call until GC + ContextCleaner get to it. Callers
  // that drive many queries (Verify/Bench, specs) call
  // [[releaseStaged]] after each action — the same staged-cache
  // ownership discipline DedupSpec enforces for Dedup's operators.
  //
  // Entries are WEAK references: a library caller unaware of the
  // release contract must not have its caches pinned unboundedly by
  // this registry — once the result DataFrame (and with it the sorted
  // RDD) becomes unreachable, ContextCleaner can unpersist and GC it
  // exactly as if the registry did not exist; releaseStaged() then
  // skips the cleared entry. The registry only adds an eager-release
  // path for still-reachable lineages, it never extends a lifetime.
  private val staged = new java.util.concurrent.ConcurrentLinkedQueue[
    java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]()

  /** Unpersist every staged sorted lineage registered since the last
   * release; returns how many were dropped (entries already reclaimed
   * by GC + ContextCleaner are drained but not counted). Safe while
   * results are still referenced — a re-action just recomputes the
   * sort. */
  def releaseStaged(): Int = {
    var n = 0
    var r = staged.poll()
    while (r != null) {
      val rdd = r.get()
      if (rdd != null) { rdd.unpersist(blocking = false); n += 1 }
      r = staged.poll()
    }
    n
  }

  /** Number of staged lineages currently registered (spec census). */
  def stagedCount: Int = staged.size()

  /** Weak-register an RDD-level cache for [[releaseStaged]] — the
   * registration hook [[Stage.eager]]'s checkpoint row blocks share
   * with the staged sorts (same per-query release discipline; entries
   * never extend a lifetime). */
  private[functions] def register(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    staged.add(new java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]](rdd))
    ()
  }

  /** Append a 1-based global rank column ordered by `sortCols`.
   * The sorted lineage is persisted across zipWithIndex's two passes
   * (its eager partition-count job, then the result map) — same
   * bracket as [[withRankAndRunningSum]] — so the range-partitioned
   * sort executes ONCE, not twice. The persisted lineage is registered
   * for [[releaseStaged]]; release it after the result's action. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    staged.add(new java.lang.ref.WeakReference(rdd))
    val ranked = rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }

  /**
   * Append BOTH a 1-based global rank and a global running (inclusive
   * prefix) sum of `valueCol`, ordered by `sortCols` — the cumulative
   * half of a Pareto / quantile-share computation, without a
   * single-partition Window. Same two-pass shape as [[withGlobalRank]]:
   * range-partitioned parallel sort, then one tiny O(#partitions) job
   * collecting per-partition (count, sum) to the driver, then a second
   * parallel pass that seeds each partition with its offsets. The
   * sorted lineage is persisted across the two passes so the sort runs
   * once; caller sees an unpersisted result (the offsets job is the
   * only extra action).
   *
   * `valueCol` must be integer-valued (or exactly representable): the
   * prefix sums are accumulated in Double with exact integer
   * arithmetic, keeping them independent of partition boundaries.
   */
  def withRankAndRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      rankOut: String, cumOut: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.withColumn("_rs_val", valueCol.cast("double")).orderBy(sortCols: _*)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    staged.add(new java.lang.ref.WeakReference(rdd))
    val valIdx = sorted.schema.fieldIndex("_rs_val")
    val perPart = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var s = 0.0
      it.foreach { r => n += 1; s += r.getDouble(valIdx) }
      Iterator((i, n, s))
    }.collect().sortBy(_._1)
    val rankOff = perPart.scanLeft(0L)((acc, p) => acc + p._2).init
    val sumOff = perPart.scanLeft(0.0)((acc, p) => acc + p._3).init
    val schema = sorted.schema
      .add(rankOut, LongType, nullable = false)
      .add(cumOut, org.apache.spark.sql.types.DoubleType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = rankOff(i); var cum = sumOff(i)
      it.map { r =>
        rank += 1; cum += r.getDouble(valIdx)
        Row.fromSeq(r.toSeq :+ rank :+ cum)
      }
    }
    spark.createDataFrame(out, schema).drop("_rs_val")
  }
}
