package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sequence packing — the continuous form of the t15 batch
 * operator: documents arrive on a stream and each is assigned the
 * (bin, offset) where it lands in its source's packed token stream,
 * with the running cursor carried in keyed state.
 *
 * Semantics match the batch prefix-sum EXACTLY when documents arrive
 * in doc_id order per source (the batch operator's ordering); within
 * a micro-batch, rows are sorted by doc_id before folding, so
 * intra-batch arrival order cannot perturb positions. State is ONE
 * long per source — O(#sources), not O(docs) — with no timeout: a
 * packing cursor stays meaningful for the stream's lifetime, and the
 * number of sources is dimension-sized. At cluster scale the groupBy
 * shards sources across executors exactly like the batch window's
 * partition key.
 */
object StreamingPacking {
  case class DocIn(source: String, doc_id: Long, n_tokens: Long)
  case class Packed(source: String, doc_id: Long, n_tokens: Long,
      bin: Long, bin_offset: Long)

  /** docs columns: source (string), doc_id (long), n_tokens (long). */
  def pack(docs: DataFrame, budget: Long = 2048L): Dataset[Packed] = {
    val session = docs.sparkSession
    import session.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Packed](OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocIn], state: GroupState[Long]) =>
          var pos = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val p = Packed(source, r.doc_id, r.n_tokens, pos / budget, pos % budget)
            pos += r.n_tokens
            p
          }
          state.update(pos)
          out.iterator
      }
  }
}
