package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Live per-source corpus datasheet (the streaming face of the t24
 * corpus card): per micro-batch, each document's card SIGNALS — token
 * and char counts, gopher-keep verdict, content digest — are appended
 * to a signal table, stamped with the batch id; the card itself is a
 * read-time aggregation over that table. This is observability for an
 * ingest stream: "what has this feed contributed, how much of it
 * passes the filter, how much is duplicated" at any moment, without
 * re-reading any document text.
 *
 * Scale contract:
 *  - per-batch work is ONE map pass over the batch (signals are all
 *    zero-shuffle Column arithmetic) + an append — cost scales with
 *    the batch, never the corpus;
 *  - document text never enters the store — the signal row is a
 *    fixed-width projection, so the store stays tiny relative to the
 *    corpus and the read-time card aggregates narrow columns only;
 *  - at-least-once replays append bit-identical rows (signals are
 *    pure functions of the document) that [[card]] collapses per
 *    doc_id by max batch stamp — the [[StreamingIvfIndex]] contract.
 */
object StreamingCorpusCard {

  /** One batch → signal rows (doc_id, source, n_tokens, n_chars,
   * keep, digest). */
  def signals(batch: DataFrame, idCol: String, sourceCol: String,
      textCol: String): DataFrame =
    TextAnalysis.gopherRules(
        batch.select(col(idCol), col(sourceCol), col(textCol)), idCol, textCol)
      .select(col(idCol), col("keep"))
      .join(batch.select(col(idCol), col(sourceCol),
        TextAnalysis.bpeishTokenCount(col(textCol)).cast("long").as("n_tokens"),
        length(col(textCol)).cast("long").as("n_chars"),
        md5(col(textCol)).as("digest")), Seq(idCol))

  /** Attach to a document stream; signals append under `path`. */
  def attach(stream: DataFrame, idCol: String, sourceCol: String,
      textCol: String, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        try signals(cached, idCol, sourceCol, textCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).parquet(path)
        finally cached.unpersist()
        ()
      }
      .start()

  /** The card as of now: replay copies collapsed per doc, then the
   * same aggregation as the batch t24 query. */
  def card(spark: SparkSession, path: String, idCol: String,
      sourceCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("batch_id").desc)
    val collapsed = spark.read.parquet(path)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val dg = collapsed.groupBy(col(sourceCol), col("digest"))
      .agg(count(lit(1)).as("_dn"))
    collapsed.join(dg, Seq(sourceCol, "digest"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("_dn") > 1, 1L).otherwise(0L)).as("n_exact_dup_docs"))
  }
}
