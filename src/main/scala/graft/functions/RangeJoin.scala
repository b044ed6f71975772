package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketized range (interval-containment) join — the operator class
 * Spark has no native physical strategy for. A naive formulation
 * `facts JOIN intervals ON key = key AND ts BETWEEN start AND end`
 * planned against a non-equi predicate degenerates to a per-key
 * nested-loop; at corpus scale (billions of facts × millions of
 * intervals) that is the difference between minutes and never.
 *
 * The scale-correct shape turns the range predicate into an EQUI join:
 *  1. each interval is exploded to the fixed-width time buckets it
 *     overlaps — `floor(start/w) .. floor((end-1)/w)` (half-open
 *     [start, end) intervals);
 *  2. each fact carries its single bucket `floor(ts/w)`;
 *  3. join on (key, bucket) — a plain shuffled/broadcast hash join
 *     Catalyst already knows how to plan — then the exact containment
 *     predicate filters within the bucket.
 * A fact's bucket is unique, so a fact meets each interval at most
 * once: no post-join dedup. Replication factor is interval-side only:
 * ⌈len/w⌉ + 1 rows per interval, so pick `bucketWidth` near the median
 * interval length (shorter ⇒ smaller buckets but more interval
 * copies; longer ⇒ fewer copies but more non-matching pairs filtered
 * post-join).
 *
 * The reference has no range join (SURVEY §2.3: every join is equi);
 * this is the beyond-reference operator a telemetry warehouse needs
 * first — "which readings fall inside which downtime/maintenance
 * windows".
 */
object RangeJoin {

  /**
   * Join facts to the half-open intervals [start, end) that contain
   * them, by key. `factTs`, `ivStart`, `ivEnd` are integral epoch
   * columns in the same unit. Output: fact columns + interval columns
   * of every containing pair. Empty/inverted intervals are dropped
   * (they contain nothing; and `sequence()` on an inverted range would
   * generate DESCENDING buckets rather than none).
   */
  def bucketed(facts: DataFrame, factKey: String, factTs: String,
      intervals: DataFrame, ivKey: String, ivStart: String, ivEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals.filter(col(ivEnd) > col(ivStart))
      .withColumn("_bucket", explode(sequence(
        floor(col(ivStart) / bucketWidth).cast("long"),
        floor((col(ivEnd) - 1) / bucketWidth).cast("long"))))
    val f = facts.withColumn("_bucket", floor(col(factTs) / bucketWidth).cast("long"))
    f.join(iv,
        f(factKey) === iv(ivKey) && f("_bucket") === iv("_bucket") &&
          f(factTs) >= iv(ivStart) && f(factTs) < iv(ivEnd))
      .drop("_bucket")
  }
}
