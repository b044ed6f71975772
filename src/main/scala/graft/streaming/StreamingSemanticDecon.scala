package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Ingest-time SEMANTIC decontamination — the embedding-level face of
 * [[StreamingDecontaminate]]: incoming corpus vectors are dropped
 * when they sit within cosine `threshold` of a held-out benchmark
 * vector in the same quantizer cell (the d17 batch operator,
 * `Dedup.semanticDecontaminate`, applied per micro-batch). This is
 * the guard the shingle face cannot provide: a PARAPHRASED eval item
 * shares no n-grams with its source but still lands next to it in
 * embedding space.
 *
 * The guard is fitted ONCE at attach time: the eval-sized benchmark
 * set assigns to its quantizer cells ([[Dedup.assignBenchCells]]) and
 * persists — per batch the corpus side is a map-only literal-argmin
 * assignment plus a cell equi-join against that tiny table (broadcast
 * at scale), so per-batch cost scales with the batch and the eval
 * set, never the corpus.
 *
 * State: NONE beyond the fitted guard — verdicts are a pure function
 * of (row, guard), so an at-least-once replay reproduces bit-identical
 * kept rows; the stamped append collapses by (key, batch_id) identity
 * exactly like [[StreamingDecontaminate]]'s contract.
 */
object StreamingSemanticDecon {

  /** Fitted guard: the benchmark set pre-assigned to its cells (call
   * through [[fitGuard]] so it is persisted + materialized once). */
  final case class Guard(benchAssigned: DataFrame,
      centroids: Seq[(Int, Seq[Float])], threshold: Double, margin: Double)

  def fitGuard(bench: DataFrame, benchKey: String, embCol: String,
      centroids: Seq[(Int, Seq[Float])], threshold: Double,
      margin: Double = 0.0): Guard = {
    val assigned = Dedup.assignBenchCells(bench, benchKey, embCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    Guard(assigned, centroids, threshold, margin)
  }

  /** Release the guard's persisted bench table. */
  def releaseGuard(guard: Guard): Unit = {
    guard.benchAssigned.unpersist(false)
    ()
  }

  /** The flagged (keyCol, bench_id, cosine) facts of one batch —
   * bit-identical to the batch operator over the same rows. */
  def flaggedIn(batch: DataFrame, keyCol: String, embCol: String,
      guard: Guard): DataFrame =
    Dedup.semanticDecontaminateAgainst(batch, keyCol, embCol,
      guard.benchAssigned, guard.centroids, guard.threshold, guard.margin)

  /** One batch through the guard: returns the KEPT (clean) rows. */
  def processBatch(batch: DataFrame, keyCol: String, embCol: String,
      guard: Guard): DataFrame = {
    val contaminated = flaggedIn(batch, keyCol, embCol, guard)
      .select(col(keyCol)).distinct()
    batch.join(contaminated, Seq(keyCol), "left_anti")
  }

  /** Attach the guard to a streaming corpus; clean rows append to
   * `outPath` stamped with the micro-batch id (replay-collapsible by
   * identity, per the class contract). */
  def attach(stream: DataFrame, keyCol: String, embCol: String, guard: Guard,
      outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try {
          processBatch(cached, keyCol, embCol, guard)
            .withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Append).parquet(outPath)
        } finally cached.unpersist()
        ()
      }
      .start()
}
