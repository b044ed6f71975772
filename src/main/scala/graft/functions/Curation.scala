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
  /**
   * Corpus snapshot diff: classify every document key across two
   * corpus versions as `added` / `removed` / `changed` by comparing
   * md5 digests. The digests are computed map-side on each snapshot,
   * so only (key, 32-byte digest) pairs move through the full-outer
   * join shuffle — the text itself never shuffles, which is what makes
   * version auditing viable when a snapshot is tens of TB. Unchanged
   * keys are dropped (the diff is the deliverable, not the corpus).
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      keyCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(keyCol).as("key"), md5(col(textCol)).as("old_md5"))
    val n = newDocs.select(col(keyCol).as("key"), md5(col(textCol)).as("new_md5"))
    o.join(n, Seq("key"), "full_outer")
      .withColumn("change",
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") =!= col("new_md5"), "changed"))
      .filter(col("change").isNotNull)
  }

  /**
   * Token-budget greedy selection: rank documents by quality score
   * (descending, key tie-break) and keep the prefix whose cumulative
   * token count fits the budget — the "best N tokens" subset selection
   * step of a budgeted pretraining run. The global order + prefix sum
   * use [[GlobalRank.withRankAndRunningSum]] (range-partitioned
   * two-pass), never a single-partition Window, so the selection
   * scales to the full corpus.
   */
  def budgetSelect(docs: DataFrame, keyCol: Column, scoreCol: Column,
      tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = docs.select(keyCol.as("doc_id"), scoreCol.as("score"),
      tokenCol.cast("long").as("n_tok"))
    GlobalRank.withRankAndRunningSum(base,
        Seq(col("score").desc, col("doc_id")), col("n_tok"), "sel_rank", "_cum")
      .filter(col("_cum") <= budget)
      .select(col("doc_id"), col("score"), col("n_tok"), col("sel_rank"),
        col("_cum").cast("long").as("cum_tokens"))
  }

  /**
   * Materialize the [[mixtureWeights]] plan: replicate each document
   * `floor(w)` times plus one more with probability `frac(w)` via the
   * engine-wide deterministic md5 gate — the expected copy count per
   * source is exactly its mixture weight, so the expanded corpus
   * realizes the uniform-token-share mix (weight < 1 sources are
   * down-sampled by the same gate). The weight table is
   * source-cardinality ⇒ broadcast; the expansion is a map-side
   * explode — ZERO shuffles end to end, and replica rows carry
   * (n_rep, rep_idx) so downstream shard packing can interleave
   * epochs deterministically.
   */
  def epochExpand(docs: DataFrame, keyCol: Column, sourceCol: Column,
      tokenCol: Column): DataFrame = {
    val w = mixtureWeights(docs, sourceCol, tokenCol).select(col("source"), col("mix_weight"))
    val frac = col("mix_weight") - floor(col("mix_weight"))
    val extra = when(
      Dedup.md5Hash32(col("doc_id").cast("string")) < floor(frac * lit(4294967296.0)), 1L)
      .otherwise(0L)
    docs.select(keyCol.as("doc_id"), sourceCol.as("source"))
      .join(broadcast(w), Seq("source"))
      .withColumn("n_rep", (floor(col("mix_weight")) + extra).cast("long"))
      .filter(col("n_rep") >= 1)
      .withColumn("rep_idx", explode(sequence(lit(1L), col("n_rep"))))
      .select(col("doc_id"), col("source"), col("n_rep"), col("rep_idx"))
  }

  /**
   * Deterministic seeded global shuffle — the training order. Every
   * document gets a pseudorandom position from `md5(seed || ':' ||
   * key)` (uniform, engine-portable, reproducible from the seed
   * alone), surfaced as a contiguous 1-based `train_rank` via the
   * two-pass [[GlobalRank]] (range-partitioned sort + zipWithIndex —
   * no single-partition Window). This is the step that fixes a
   * pretraining run's data order for exact replay/resume; changing
   * the seed is a full reshuffle with zero data movement beyond the
   * one range-partitioned sort.
   */
  def trainingOrder(docs: DataFrame, keyCol: Column, seed: String): DataFrame = {
    val pos = md5(concat_ws(":", lit(seed), keyCol.cast("string")))
    GlobalRank.withGlobalRank(
      docs.withColumn("_pos", pos),
      Seq(col("_pos"), keyCol), "train_rank").drop("_pos")
  }

  /**
   * Epoch-interleaved training order over the [[epochExpand]]ed
   * corpus: every REPLICA (doc_id, rep_idx) gets its own seeded
   * position, so a document's epochs scatter uniformly through the
   * order instead of clumping — the materialized form of "sample with
   * replacement according to the mixture weights". Same two-pass
   * global rank; the only new cost over [[epochExpand]] (which is
   * shuffle-free) is the one range-partitioned sort of the expanded
   * keys — the text itself is joined back downstream by doc_id and
   * never moves through the sort.
   */
  def epochInterleave(docs: DataFrame, keyCol: Column, sourceCol: Column,
      tokenCol: Column, seed: String): DataFrame = {
    val expanded = epochExpand(docs, keyCol, sourceCol, tokenCol)
    val pos = md5(concat_ws(":", lit(seed),
      col("doc_id").cast("string"), col("rep_idx").cast("string")))
    GlobalRank.withGlobalRank(
      expanded.withColumn("_pos", pos),
      Seq(col("_pos"), col("doc_id"), col("rep_idx")), "train_rank").drop("_pos")
  }

  /**
   * Cross-source duplication matrix: for every unordered source pair,
   * how many distinct exact-duplicate texts they share — the corpus
   * audit that reveals mirror hosts and wholesale scrape overlap
   * (the reason per-source caps and dedup priorities exist). Only
   * (digest, source) pairs shuffle (text never moves); the distinct
   * pre-aggregation means the self-join runs over at most
   * #distinct-texts × #sources rows, and only digests present in ≥ 2
   * sources survive to the join output.
   */
  def sourceOverlap(docs: DataFrame, sourceCol: Column, textCol: Column): DataFrame =
    docs
      .select(md5(textCol).as("_digest"), sourceCol.as("_src"))
      .groupBy(col("_digest"))
      .agg(sort_array(collect_set(col("_src"))).as("_srcs"))
      .filter(size(col("_srcs")) >= 2)
      // unordered source pairs, map-side: a digest in s sources yields
      // s·(s−1)/2 rows (s is tiny — the hosts sharing one exact text)
      .select(explode(expr(
        """flatten(transform(_srcs,
          |  (a, i) -> transform(slice(_srcs, i + 2, size(_srcs)),
          |    b -> struct(a AS source_a, b AS source_b))))""".stripMargin)).as("_p"))
      .groupBy(col("_p.source_a").as("source_a"), col("_p.source_b").as("source_b"))
      .agg(count(lit(1)).as("shared_texts"))

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

  /**
   * Weight-proportional sample of exactly k items — priority
   * sampling (Duffield, Lund & Thorup 2007): each item gets priority
   * q = w/u for a uniform u ∈ (0,1]; the k highest priorities are the
   * sample, and τ = the (k+1)-th priority yields the unbiased
   * Horvitz–Thompson weight estimate max(w, τ) per kept item (subset
   * sums estimated over the sample are unbiased for the population).
   * The curation move for "give me a budget-sized sample where big
   * documents are proportionally represented" — uniform sampling
   * starves heavy docs, top-by-weight is deterministic bias.
   *
   * Engine-portable determinism, as everywhere in graft: u is the
   * md5-derived 32-bit hash of the key mapped to (0,1] as
   * (h+1)/2³², and q = w/u involves ONLY an IEEE-correctly-rounded
   * division — identical in any engine, unlike the log/pow the
   * exponential-key A-ES formulation would need. Ties break by key.
   *
   * Scale shape: the top-(k+1) is a TakeOrderedAndProject (per-
   * partition heaps + one k-sized merge — no global sort, no
   * single-partition window); τ comes back via a 1-row broadcast.
   * Output: (key, weight, priority, est_weight), the k kept items.
   */
  def prioritySample(docs: DataFrame, keyCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val prio = docs.select(keyCol.as("key"), weightCol.cast("double").as("weight"))
      .withColumn("_u",
        (Dedup.md5Hash32(col("key").cast("string")) + lit(1L)) / lit(4294967296.0))
      .withColumn("priority", col("weight") / col("_u"))
    val top = prio.orderBy(col("priority").desc, col("key")).limit(k + 1)
      .localCheckpoint(true) // one pass feeds both τ and the sample
    // τ = the (k+1)-th priority; 0 when the population has ≤ k items
    // (then every item is kept and est = its true weight). Every value
    // here is an IEEE double both engines computed identically, so the
    // output carries them raw — no rounding step to drift.
    val tauVal = top.agg(count(lit(1)).as("_n"), min(col("priority")).as("_min"))
      .select(when(col("_n") > k, col("_min")).otherwise(lit(0.0)).as("_tau"))
    top.orderBy(col("priority").desc, col("key")).limit(k)
      .crossJoin(broadcast(tauVal))
      .select(col("key"), col("weight"), col("priority"),
        greatest(col("weight"), col("_tau")).as("est_weight"))
  }
}
