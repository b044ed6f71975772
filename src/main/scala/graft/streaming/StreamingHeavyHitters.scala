package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming face of frequent-item detection
 * ([[graft.functions.HeavyHitters]], t38) — MERGEABLE Misra-Gries
 * summaries (Agarwal et al., "Mergeable Summaries", PODS 2012): each
 * micro-batch contributes its own m-counter MG summary as stamped
 * facts; the live candidate table is their ADDITIVE union, which the
 * mergeability theorem guarantees stays a valid MG-style summary:
 *
 *  - per-item stored count is a LOWER bound that misses at most
 *    Σ_b n_b/(m+1) = n/(m+1) of the item's true count (each batch
 *    summary undercounts by ≤ n_b/(m+1); addition preserves the
 *    bounds);
 *  - any item with true frequency ≥ φ·n appears (pigeonhole: some
 *    batch has count_b ≥ φ·n_b > n_b/(m+1) when m ≥ 1/φ), so the
 *    candidate set is a SUPERSET of the true φ-heavy hitters —
 *    the same guarantee the batch operator's candidate pass gives.
 *
 * Unlike the batch operator there is no raw stream to recount against
 * (that is the point of a summary store), so the streaming answer is
 * the summary itself: candidates with bounded-error counts. Where the
 * exact counts matter, run the batch verify pass over the archived
 * corpus — the summary tells you WHICH keys to recount.
 *
 * Store mechanics are [[SketchCompaction]] verbatim (key = the item):
 * replay collapse by fact identity, high-water exclusion, fold into a
 * bounded base. Because MG keys are data-dependent (up to m NEW keys
 * per batch), the folded base can still grow with stream age —
 * [[trimBase]] applies the mergeable-summaries reduction: keep the
 * top `m` counters and subtract the (m+1)-th value from the keepers,
 * which re-establishes the ≤ m-keys bound at the cost of one more
 * n/(m+1)-style undercount, tracked by the same error algebra.
 */
object StreamingHeavyHitters {

  /** One batch → its stamped m-counter MG summary rows
   * `(v, n, batch_id)`. Pure; spec-drivable. */
  def batchSummary(batch: DataFrame, valueCol: String, m: Int,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    require(m > 0, s"m must be positive, got $m")
    val values = batch.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
    // one MG pass per partition, then one bounded merge: counters sum
    // additively across partitions (the same mergeability theorem)
    values.as[String].mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](m * 2)
      it.foreach { v =>
        val cur = counters.get(v)
        if (cur != null) counters.put(v, cur + 1L)
        else if (counters.size < m) counters.put(v, java.lang.Long.valueOf(1L))
        else {
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.entrySet().asScala.iterator.map(e => (e.getKey, e.getValue.longValue()))
    }.toDF("v", "n")
      .groupBy(col("v")).agg(sum(col("n")).as("n"))
      .withColumn("batch_id", lit(batchId))
  }

  /** Attach to a stream; stamped summaries append under `path`,
   * folding into the compacted base every `compactEvery` batches
   * with a trim back to `m` keys. */
  def attach(stream: DataFrame, valueCol: String, m: Int, path: String,
      checkpoint: String, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    implicit val spark: SparkSession = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchSummary(batch, valueCol, m, batchId)
          .write.mode(SaveMode.Append).parquet(path)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          SketchCompaction.compact(path, Nil, Seq("v"))
          trimBase(path, m)
        }
        ()
      }
      .start()
  }

  /** The live candidate table `(v, n)` — additive union of every
   * batch summary (replay-collapsed, compaction-aware). `n` is a
   * lower bound within n_total/(m+1) of the true count (plus one such
   * term per [[trimBase]] application). */
  def candidates(path: String)(implicit spark: SparkSession): DataFrame =
    SketchCompaction.counters(path, Nil, Seq("v"))

  /** Mergeable-summaries reduction of the compacted base: keep the m
   * largest counters minus the (m+1)-th value (items at or below it
   * drop to ≤ 0 and are removed). No-op when the base holds ≤ m
   * keys. Loose (not-yet-folded) facts are untouched. */
  def trimBase(path: String, m: Int)(implicit spark: SparkSession): Unit = {
    SketchCompaction.readBase(path).foreach { case (bins, hwm) =>
      val rows = bins.count()
      if (rows > m) {
        val cut = bins.orderBy(col("n").desc, col("v")).limit(m + 1)
          .agg(min(col("n"))).head().getLong(0)
        val trimmed = bins.withColumn("n", col("n") - lit(cut))
          .filter(col("n") > 0L)
          .localCheckpoint(true) // cut lineage off the base being replaced
        SketchCompaction.writeBase(trimmed, hwm, path)
      }
    }
  }
}
