package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Ingest-time decontamination: a streaming corpus is guarded against
 * a HELD-OUT eval/benchmark set, so contaminated documents never
 * enter the training corpus at all (the streaming face of the d9/d11
 * batch operators — same containment semantics, same Bloom-then-exact
 * two-phase shape).
 *
 * The guard is fitted ONCE at attach time from the benchmark-sized
 * eval set: a Bloom sketch over the eval shingle vocabulary (rides to
 * executors as a literal — no per-batch broadcast) plus the exact
 * eval shingle index for the verify join. Per micro-batch:
 *
 *  1. **Bloom prefilter** (map-side, codegen'd): batch docs with NO
 *     sketch-positive shingle — the overwhelming majority — are kept
 *     immediately; only sketch-positive docs proceed. False positives
 *     cost a redundant exact check; false negatives don't exist, so
 *     no contaminated doc can slip through.
 *  2. **Exact verify**: [[Dedup.contaminationPairs]] on the
 *     candidates only — the n-gram containment join that kills Bloom
 *     false positives. Docs at/above `minContainment` against ANY
 *     eval doc are dropped.
 *
 * Kept rows append to `outPath` stamped with the micro-batch id, so
 * an at-least-once replay appends bit-identical rows that a serving
 * read collapses by (key, max batch_id) — the same contract as
 * [[StreamingIvfIndex]].
 *
 * State: NONE beyond the fitted guard — per-batch cost scales with
 * the batch (and the benchmark-sized eval index), never the corpus.
 */
object StreamingDecontaminate {

  /** Fitted eval-side guard. `evalDocs` must be the benchmark-sized
   * held-out set (it is staged per batch for the verify join). */
  final case class Guard(bloom: Array[Byte], evalDocs: DataFrame,
      keyCol: String, textCol: String, n: Int, minContainment: Double)

  def fitGuard(evalDocs: DataFrame, keyCol: String, textCol: String,
      n: Int = 5, minContainment: Double = 0.5, fpp: Double = 0.01): Guard = {
    val shingles = Dedup.shingleIndex(evalDocs, keyCol, textCol, n)
      .select(col("shingle")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val guard = try {
      val nShingles = math.max(1L, shingles.count())
      Guard(Dedup.bloomOf(shingles, col("shingle"), nShingles, fpp),
        evalDocs, keyCol, textCol, n, minContainment)
    } finally shingles.unpersist()
    guard
  }

  /** One batch through the guard: returns the KEPT (clean) rows. */
  def processBatch(batch: DataFrame, guard: Guard): DataFrame = {
    val sets = Dedup.shingleSetsPersisted(batch, guard.keyCol, guard.textCol, guard.n)
      .select(col("doc_id").as("_gid"),
        exists(col("sh_set"), s => Dedup.bloomMightContain(guard.bloom, s)).as("_hit"))
    val flagged = batch.join(sets, batch(guard.keyCol) === col("_gid"), "left")
      .drop("_gid")
    val candidates = flagged.filter(col("_hit")).drop("_hit")
    val contaminated = Dedup.contaminationPairs(candidates, guard.evalDocs,
        guard.keyCol, guard.textCol, guard.n, guard.minContainment)
      .select(col("train_id").as(guard.keyCol)).distinct()
    flagged.filter(!coalesce(col("_hit"), lit(false))).drop("_hit")
      .unionByName(candidates.join(contaminated, Seq(guard.keyCol), "left_anti"))
  }

  /** Attach the guard to a streaming corpus; clean rows append to
   * `outPath` stamped with the micro-batch id. */
  def attach(stream: DataFrame, guard: Guard, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          processBatch(cached, guard)
            .withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(outPath)
        } finally cached.unpersist()
        ()
      }
      .start()
}
