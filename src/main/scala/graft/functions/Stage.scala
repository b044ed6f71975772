package graft.functions

import org.apache.spark.sql.DataFrame

/**
 * Shared staging helpers for the multi-consumer corpus stages
 * (guide §1.2 "the distributed algorithm", §2 parallelism, §5 caching).
 *
 * Round-17 profiling (ProfileQuery per-job, sf0.1) showed the round-16
 * eager `persist(); count()` batch regressed 2-4× NOT because eager
 * materialization is wrong but because of two mechanical costs:
 *
 *  1. The corpus parquet at bench scale is ONE split, so every
 *     scan→tokenize→shingle map stage ran in ONE task (profiled
 *     430-700 ms serial jobs on d2/t20/d24); the blocking count
 *     serialized work AQE previously overlapped across cores.
 *     [[fanOut]] repartitions to the session's parallelism ONLY when
 *     the scan produced fewer partitions — at warehouse scale the
 *     input splits exceed the core count and no shuffle is added
 *     (the p1/t12 pattern from round 16, applied to the staged
 *     corpus passes).
 *  2. `persist(MEMORY_AND_DISK)` stores columnar InMemoryRelation
 *     batches; encode+decode of array rows (shingle sets, token
 *     arrays) measured 10-30× slower than recompute (the r16 e4
 *     finding). [[eager]] materializes as executor-local ROW blocks
 *     (`localCheckpoint`) instead: one pass, no columnar
 *     encode/decode, lineage truncated so iterative/branchy consumer
 *     plans stay flat.
 *
 * The eager-materialization motivation is unchanged from round 16:
 * AQE materializes independent exchange subtrees concurrently and a
 * persisted-but-uncomputed cache block has no cross-task compute
 * lock, so every differently-projected consumer of a LAZY shared
 * stage recomputes its full lineage (profiled at 8 corpus passes in
 * one d7 action). One parallel materialization job keeps the
 * one-corpus-pass property at none of the serialization cost.
 *
 * Lifecycle: localCheckpoint blocks are RDD-level — invisible to
 * `spark.catalog.clearCache()` and to `Dataset.unpersist` (which only
 * talks to the CacheManager). Operators that own a stage release it
 * deterministically with [[release]]; as a safety net every
 * checkpoint is ALSO weak-registered with
 * [[GlobalRank.releaseStaged]], the per-query hygiene hook
 * Bench/Verify/ProfileQuery already call (without it the r17 profile
 * run measurably degraded across samples from accumulated blocks).
 * Releasing truncated-lineage blocks makes later re-actions of plans
 * referencing them impossible by design — the release points sit
 * after the consuming result is materialized (ownStages) or after the
 * per-query action (releaseStaged), matching the existing staged-sort
 * ownership discipline.
 */
private[graft] object Stage {

  /** Fan a computation-heavy map chain out to the session's cores when
   * the source scan produced FEWER partitions (the local single-file
   * regime: one parquet file = one input split = one task for the
   * whole chain). At warehouse scale the input splits provide the
   * parallelism for free and the condition is false — no shuffle is
   * added. Round-robin repartition is safe here: every consumer is an
   * aggregation/join whose result is row-order independent. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Materialize a stage referenced by several differently-projected
   * downstream subtrees, as executor-local row blocks — one pass (the
   * AQE-recompute guard), no columnar encode/decode, parallel when
   * the plan below it is (pair with [[fanOut]] on single-split
   * sources). Identical-subtree consumers need no materialization:
   * AQE's stage cache already shares their exchange. Owner releases
   * with [[release]]; the weak registry backstops it per query. */
  def eager(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    checkpointRdd(cp).foreach(GlobalRank.register)
    cp
  }

  /** Free a stage produced by [[eager]] (checkpoint row blocks) or a
   * plain persisted stage — the one release call sites need. */
  def release(df: DataFrame): Unit =
    checkpointRdd(df) match {
      case Some(rdd) => rdd.unpersist(blocking = false); ()
      case None => df.unpersist(blocking = false); ()
    }

  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }
}
