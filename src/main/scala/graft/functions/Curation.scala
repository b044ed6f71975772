package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation policies that act on the provenance (`source`)
 * column — the host/domain-level controls a web-scale training-data
 * pipeline applies after per-document filtering: hard per-source
 * document caps (the "no single host dominates" rule) and global
 * mixture re-weighting toward a target token distribution.
 */
object Curation {

  /**
   * Deterministic per-source document cap: keep the `cap` documents of
   * each source with the lowest md5(key) — a seedless uniform draw
   * that is stable across runs and engines. The rank is a
   * `row_number` window partitioned BY SOURCE (never global), and the
   * `<= cap` filter on it lets Spark's WindowGroupLimit rule prune
   * each partition to `cap` rows before the full per-source sort
   * materializes — per-host work is O(|host| log cap)-ish, and a
   * pathological mega-host never needs its full ordering.
   *
   * Output keeps all input columns plus `cap_rank` (1-based).
   */
  def sourceCap(docs: DataFrame, keyCol: Column, sourceCol: Column, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val key = keyCol.cast("string")
    val w = Window.partitionBy(sourceCol).orderBy(md5(key), key)
    docs.withColumn("cap_rank", row_number().over(w)).filter(col("cap_rank") <= cap)
  }

  /**
   * Mixture weights toward a UNIFORM per-source token share: for each
   * source, its document/token counts, observed token share, and the
   * up/down-sampling factor `mix_weight = (total_tokens / n_sources) /
   * source_tokens` that equalizes expected tokens per source (the
   * pre-training data-mixing table; weight > 1 ⇒ upsample/repeat
   * epochs, < 1 ⇒ subsample). One map-side-combinable aggregation over
   * the corpus; the totals normalizer is a 1-row broadcast. Shares and
   * weights divide exact integer sums — single IEEE ops, portable
   * across engines.
   */
  def mixtureWeights(docs: DataFrame, sourceCol: Column, tokenCol: Column): DataFrame = {
    val per = docs.groupBy(sourceCol.as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCol.cast("long")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("_tot"), count(lit(1)).as("_s"))
    per.crossJoin(broadcast(tot)).select(
      col("source"), col("n_docs"), col("n_tokens"),
      round(col("n_tokens") / col("_tot"), 6).as("token_share"),
      round((col("_tot") / col("_s")) / col("n_tokens"), 6).as("mix_weight"))
  }
}
