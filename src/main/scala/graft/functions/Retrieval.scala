package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text retrieval over a document corpus — the query→top-k
 * direction that complements [[Dedup.tfidfPairs]]'s doc↔doc
 * similarity. The reference's query surface is key/range lookups
 * (machine-downtime-monitor-on-aws `query-data.ts`); BM25 is the
 * standard lexical ranking a large-scale training-data pipeline adds
 * on top for corpus exploration, hard-negative mining and
 * retrieval-based decontamination.
 *
 * Scale shape (the part that must survive 100 TB):
 *  - candidates come from an inverted-index equi-join on `term`
 *    (query terms × posting lists), NEVER query × corpus;
 *  - the stop-term guard (df ≤ ⌊N·maxDfFrac⌋, default 0.5 — the
 *    [[Dedup.tfidfPairs]] guard, parameterized) bounds every posting
 *    list touched — without it one stopword in one query scans the
 *    whole corpus. Dense-vocabulary corpora (domain logs, the
 *    synthetic test tables) where EVERY term is frequent need the
 *    frac raised — retrieval there legitimately touches most of the
 *    corpus, and the smoothed idf keeps frequent terms proportional
 *    rather than dominant;
 *  - the per-(query, doc) score is a map-side-combinable BIGINT sum;
 *  - top-k is `row_number` over a (query)-partitioned window with the
 *    rank filter adjacent, which Spark executes as WindowGroupLimit —
 *    per-partition heaps of size k, no global sort.
 *
 * Engine-portable arithmetic (the [[Dedup.tfidfPairs]] discipline,
 * extended to BM25's rational constants k1 = 1.2, b = 0.75):
 *  - idf_i = ⌊10⁴ · ln((N − df + 0.5)/(df + 0.5) + 1)⌋ — the
 *    Lucene-smoothed Robertson idf, floor-quantized to an exact
 *    integer. The ln is the ONE libm call in the chain, and it is
 *    kept out of cross-engine replay entirely: the oracle generator
 *    collects [[idfOf]]'s output and inlines the integers as
 *    literals, so a replaying engine evaluates NO ln — the r11
 *    driver-gate lesson ([[idfBoundaryMargins]] is the attribution
 *    diagnostic);
 *  - the per-term score idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
 *    — mathematically ⌊220·idf_i·tf / (tf + 0.3 + 0.9·(dl·N / S))⌋ —
 *    is evaluated with ZERO floating-point operations: multiplying
 *    the ratio through by 10·S gives the identical value as exact
 *    integer division, score = (2200·S·idf_i·tf) div
 *    (10·S·tf + 3·S + 9·dl·N), carried in DECIMAL(38,0) (Spark) /
 *    HUGEINT (oracle). Two driver rounds (r11, r12) proved that even
 *    single-IEEE-step float trees mirrored operand-for-operand can
 *    resolve differently across engine environments at floor
 *    boundaries; exact integer arithmetic removes the boundary
 *    entirely — no libm, no rounding, nothing environment-sensitive;
 *  - per-(query, doc) totals sum those BIGINT micro-scores exactly, so
 *    accumulation order (partitioning) cannot perturb the ranking.
 *  Headroom recorded here: the numerator magnitude is
 *  2200·S·idf_i·tf ≲ 10²⁶ at S = 10¹³ tokens (≈ 100 TB of text) —
 *  twelve orders below the DECIMAL(38,0)/HUGEINT ceiling.
 *
 * Query-term semantics: DISTINCT terms per query (set-of-terms, the
 * common practical choice); a query term absent from the corpus (or
 * stop-guarded) contributes nothing. A query whose every term is
 * guarded/absent returns no rows.
 */
object Retrieval {

  private def ownStages(stages: DataFrame*)(result: DataFrame): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try out.count()
    catch {
      case t: Throwable =>
        out.unpersist(false)
        stages.foreach(Stage.release)
        throw t
    }
    stages.foreach(Stage.release)
    out
  }

  /**
   * BM25 top-k retrieval: for each query (qKeyCol, qTermsCol:
   * array<string>) return the k best-scoring documents.
   *
   * Output: (query_id, doc_id, score_micro BIGINT = 10⁶·BM25 quantized
   * per term, rank INT 1..k). Ties break on doc_id ascending, so the
   * result is fully deterministic.
   *
   * Two fit-time scalar jobs (corpus size N, total token count S) run
   * up front — O(scan) metadata, the same pattern as
   * [[Dedup.tfidfPairs]]'s corpus count. The (doc, term, tf) index is
   * persisted across its two consumers (df aggregation + posting join)
   * and released before returning.
   */
  def bm25TopK(docs: DataFrame, keyCol: String, textCol: String,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double = 0.5): DataFrame = {
    val (tf, dl) = postingsMaterialized(docs, keyCol, textCol)
    bm25TopKFromIndex(tf, dl, queries, qKeyCol, qTermsCol, k, maxDfFrac)
  }

  /** The derived (doc_id, term, tf) / (doc_id, dl) projections of a
   * corpus — the persistable inverted index [[bm25TopKFromIndex]]
   * serves from. Materialize these once (bucketed by term) for a
   * standing query workload instead of re-deriving per call. Lazy:
   * one-shot consumers (index writes) evaluate each projection once;
   * the per-call fit paths use [[postingsMaterialized]] instead.
   * fanOut parallelizes the single-split local tokenize (no-op at
   * warehouse split counts). */
  def postingsOf(docs: DataFrame, keyCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = Stage.fanOut(docs).select(col(keyCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    (toks.select(col("doc_id"), explode(col("_t")).as("term"))
       .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")),
     toks.select(col("doc_id"), size(col("_t")).cast("long").as("dl")))
  }

  /** [[postingsOf]] with both projections MATERIALIZED as row blocks
   * from ONE tokenize pass — the per-call fit shape: the token
   * projection is checkpointed once ([[Stage.eager]], fanned out past
   * the single-split local scan), tf and dl are materialized from its
   * blocks, and the token blocks are released before returning. A
   * lazy lineage tokenized the corpus up to 4× per bm25 call
   * (r16/r17 profiling: one serial tokenize per divergent consumer —
   * tf's idf agg + posting join, dl's stats agg + posting join).
   * The returned stages are the CALLER's to release
   * ([[Stage.release]]; bm25Impl's ownStages does it). */
  private def postingsMaterialized(docs: DataFrame, keyCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = Stage.eager(Stage.fanOut(docs).select(col(keyCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("_t")))
    val tf = Stage.eager(toks.select(col("doc_id"), explode(col("_t")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val dl = Stage.eager(
      toks.select(col("doc_id"), size(col("_t")).cast("long").as("dl")))
    Stage.release(toks)
    (tf, dl)
  }

  /**
   * BM25 over a pre-built inverted index: `tf` = (doc_id, term, tf),
   * `dl` = (doc_id, dl — one row per doc, blank docs included with
   * dl = 0). Identical output to [[bm25TopK]] over the corpus the
   * index was derived from; this is the entry point for a
   * materialized/bucketed postings table or a streaming-maintained
   * store ([[graft.streaming.StreamingRetrieval]]).
   */
  def bm25TopKFromIndex(tfIn: DataFrame, dl: DataFrame,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double = 0.5): DataFrame =
    bm25Impl(tfIn, dl, None, queries, qKeyCol, qTermsCol, k, maxDfFrac)

  /**
   * Metadata-filtered BM25 — the lexical analogue of the filtered-ANN
   * contract (n11): rank only documents in `allowed` (any DataFrame
   * with a doc-key column), while corpus statistics (N, S, df) stay
   * GLOBAL — a filter restricts the candidates, it never re-derives
   * the scoring space, so a document's score is filter-invariant.
   * The allowed set enters as a LeftSemi on the posting side BEFORE
   * the query join: disallowed postings never reach scoring, and at
   * scale the semi-join key is the doc id — the same partitioning the
   * posting store already has.
   */
  def bm25TopKFiltered(docs: DataFrame, keyCol: String, textCol: String,
      allowed: DataFrame, allowedKeyCol: String,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double = 0.5): DataFrame = {
    val (tf, dl) = postingsMaterialized(docs, keyCol, textCol)
    bm25Impl(tf, dl, Some(allowed.select(col(allowedKeyCol).as("doc_id"))),
      queries, qKeyCol, qTermsCol, k, maxDfFrac)
  }

  /**
   * The guarded `(term, idf_i)` table of a corpus: document frequency
   * with the stop-term guard (df ≤ ⌊N·maxDfFrac⌋), idf floor-quantized
   * to an exact integer — `idf_i = ⌊10⁴ · ln((N − df + 0.5)/(df + 0.5)
   * + 1)⌋`, the ONE libm call in the whole BM25 chain. Public because
   * the oracle generator collects THIS DataFrame and inlines the
   * resulting integers as literals (the ivfCentroids generated-literal
   * pattern): the replayed oracle then contains no `ln` at all, so no
   * cross-engine libm ulp can ever flip a score — the idf boundary is
   * resolved once, engine-side, and shipped as data.
   */
  def idfOf(tf: DataFrame, n: Long, maxDfFrac: Double): DataFrame =
    idfFromDf(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), n, maxDfFrac)

  /** [[idfOf]] from a PRECOMPUTED (term, df) table — the serve-path
   * variant: a standing index materializes document frequency once
   * ([[writeIndexTables]]'s `_df` table) and every query batch after
   * derives the stop guard + idf_i from it without aggregating the
   * postings again. The guard and the quantized-idf expression are
   * the same code path as [[idfOf]], so served and direct rankings
   * are identical by construction. */
  def idfFromDf(dfTab: DataFrame, n: Long, maxDfFrac: Double): DataFrame = {
    val maxDf = math.floor(n * maxDfFrac).toLong
    dfTab.filter(col("df") <= maxDf)
      .withColumn("idf_i",
        floor(lit(1e4) * log(
          (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0))).cast("long"))
      .select(col("term"), col("idf_i"))
  }

  /**
   * Boundary-distance diagnostic for [[idfOf]]'s floor quantization:
   * per guarded term, how far `10⁴·ln(arg)` sits from the nearest
   * integer boundary (in quantization-step units, 1.0 = one idf_i
   * step). A cross-engine libm discrepancy of ε ulps can flip a
   * term's idf_i only if its margin < ~|10⁴·ln(arg)|·ε·2⁻⁵², so a
   * corpus whose min margin is ≫ 1e-9 is safe under any conforming
   * libm — and when a flip DOES happen, this table names the term
   * that moved. Emitted to stderr at oracle-generation time.
   */
  def idfBoundaryMargins(tf: DataFrame, n: Long, maxDfFrac: Double): DataFrame = {
    val maxDf = math.floor(n * maxDfFrac).toLong
    val f = lit(1e4) * log(
      (lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .withColumn("_f", f)
      .select(col("term"), col("df"),
        floor(col("_f")).cast("long").as("idf_i"),
        least(col("_f") - floor(col("_f")),
          lit(1.0) - (col("_f") - floor(col("_f")))).as("margin"))
  }

  private def bm25Impl(tfIn: DataFrame, dlIn: DataFrame,
      allowed: Option[DataFrame],
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDfFrac > 0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    // fit-time scalars: corpus size and total token mass (exact
    // longs), ONE fused agg job. dl needs no persist of its own: from
    // postingsOf it is a cheap map over the materialized token blocks
    // (one corpus tokenize total — see postingsOf), from a table it is
    // a scan.
    val (n, s) = {
      val r = dlIn.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      val (nn, ss) = (r.getLong(0), r.getLong(1))
      require(nn > 0 && ss > 0, "bm25 needs a non-empty, non-blank corpus")
      (nn, ss)
    }

    val dfreq = idfOf(tfIn, n, maxDfFrac)

    val qterms = queries.select(col(qKeyCol).as("query_id"),
      explode(array_distinct(col(qTermsCol))).as("term"))

    // tf/dl arrive MATERIALIZED from the docs-based entries
    // (postingsMaterialized row blocks — the AQE-recompute guard) and
    // are released here once the result is; table/store-backed callers
    // pass plain scans, for which the release is a no-op and each
    // consumer is a bucketed-scan re-read (the serve contract).
    ownStages(tfIn, dlIn)(
      rankedScores(tfIn, dfreq, dlIn, n, s, allowed, qterms, k))
  }

  /** The scoring half of [[bm25Impl]] — inverted-index join + exact
   * BIGINT micro-score totals + WindowGroupLimit top-k — factored out
   * so multi-pass compositions ([[bm25PrfTopK]]) reuse the SAME
   * arithmetic tree over one set of persisted stats. `qterms` must be
   * distinct (query_id, term) rows. */
  private def rankedScores(tf: DataFrame, dfreq: DataFrame, dl: DataFrame,
      n: Long, s: Long, allowed: Option[DataFrame],
      qterms: DataFrame, k: Int): DataFrame = {
    // inverted-index join: query terms × (guarded) posting lists.
    // A filter prunes candidate postings EARLIEST (LeftSemi on the
    // doc key) — stats above stay global, per the filtered contract.
    val candTf = allowed.fold(tf)(a => tf.join(a, Seq("doc_id"), "left_semi"))
    val posting = candTf.join(dfreq, Seq("term")).join(dl, Seq("doc_id"))
    val matched = qterms.join(posting, Seq("term"))

    // per-term micro-score — ZERO float ops. The rational form
    // ⌊220·idf_i·tf / (tf + 0.3 + 0.9·dl·N/S)⌋ multiplied through by
    // 10·S is the SAME value (the ratio is unchanged and floor
    // commutes with it), but every operand is now an exact integer:
    //   score = (2200·S·idf_i·tf) div (10·S·tf + 3·S + 9·dl·N).
    // DECIMAL(38,0) carries the products exactly (the numerator
    // ~2200·S·idf·tf passes the int64 range near S ≈ 10¹³; worst
    // realistic magnitude ~10²⁶ ≪ 10³⁸) and `div` is Catalyst's
    // IntegralDivide — BigDecimal divideToIntegralValue, exact. The
    // oracle mirrors the identical formula in HUGEINT, so the score
    // is environment-proof by construction: no libm, no IEEE
    // rounding, nothing an engine or platform can resolve differently.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val num = dec(lit(2200L)) * dec(col("idf_i")) * dec(col("tf")) * dec(lit(s))
    val den = dec(lit(10L)) * dec(lit(s)) * dec(col("tf")) +
      dec(lit(3L)) * dec(lit(s)) + dec(lit(9L)) * dec(col("dl")) * dec(lit(n))

    val scored = matched
      .select(col("query_id"), col("doc_id"), num.as("_num"), den.as("_den"))
      .withColumn("_sm", expr("_num div _den"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_sm")).as("score_micro"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_micro"),
        col("rank").cast("int").as("rank"))
  }

  /**
   * Pseudo-relevance-feedback query expansion (RM3-lite): run BM25,
   * mine expansion terms from each query's top `fbDocs` results, and
   * re-score the expanded term set — the classic recall lever when
   * queries are short and vocabulary mismatch loses relevant docs.
   *
   * Expansion-term weight over the feedback set is
   * `w_exp(q, t) = Σ_{d ∈ fb(q)} tf(d, t) · idf_i(t)` — exact BIGINT
   * products of exact integers (tf ≤ doc length, idf_i ≤ ~1.2·10⁵,
   * fbDocs bounded ⇒ no overflow), so term selection is deterministic
   * cross-engine: top `expTerms` per query by (w_exp DESC, term),
   * original query terms excluded by anti-join. The expanded query is
   * the term-set UNION (sets are disjoint by the anti-join), scored by
   * the same [[rankedScores]] tree — output shape identical to
   * [[bm25TopK]].
   *
   * Scale shape: ONE tokenize and one (N, S, df) stats pass serve both
   * passes (tf/dl persisted across them); the feedback join is
   * queries × fbDocs rows against the doc-keyed tf — tiny next to the
   * posting join either pass runs; expansion adds ≤ expTerms terms per
   * query, so pass 2 costs the same O(Σ posting-list) as pass 1.
   */
  def bm25PrfTopK(docs: DataFrame, keyCol: String, textCol: String,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, fbDocs: Int = 5, expTerms: Int = 3,
      maxDfFrac: Double = 0.5): DataFrame = {
    val (tfIn, dlIn) = postingsMaterialized(docs, keyCol, textCol)
    bm25PrfTopKFromIndex(tfIn, dlIn, queries, qKeyCol, qTermsCol,
      k, fbDocs, expTerms, maxDfFrac)
  }

  /** [[bm25PrfTopK]] over a pre-built inverted index — and, through
   * [[bm25PrfTopKFromTables]], over the bucketed serving tables: the
   * fit/serve duality the plain ranker has (bm25TopK ↔ r6) applies to
   * the expansion path unchanged, because PRF only ever reads the
   * index (both passes and the feedback mine). */
  def bm25PrfTopKFromIndex(tfIn: DataFrame, dlIn: DataFrame,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, fbDocs: Int = 5, expTerms: Int = 3,
      maxDfFrac: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(expTerms >= 0, s"expTerms must be >= 0, got $expTerms")
    // fused (N, S) stats job — see bm25Impl's note; dl itself stays a
    // cheap map over the materialized token blocks / a table scan
    val (n, s) = {
      val r = dlIn.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      val (nn, ss) = (r.getLong(0), r.getLong(1))
      require(nn > 0 && ss > 0, "bm25 needs a non-empty, non-blank corpus")
      (nn, ss)
    }
    val dfreq = idfOf(tfIn, n, maxDfFrac)
    // consumed three times (pass-1 join, expansion anti-join, union) —
    // eager row blocks (AQE note at bm25Impl)
    val qterms = Stage.eager(queries.select(col(qKeyCol).as("query_id"),
        explode(array_distinct(col(qTermsCol))).as("term")))
    // tf/dl release semantics as in bm25Impl (no-op for table scans)
    ownStages(tfIn, dlIn, qterms)(
      prfRanked(tfIn, dfreq, dlIn, n, s, qterms, k, fbDocs, expTerms))
  }

  /** The two-pass PRF body over resolved stats — shared between the
   * fit path ([[bm25PrfTopKFromIndex]], which derives (n, s, dfreq)
   * per call) and the serve path ([[bm25PrfTopKFromStats]], which
   * reads them from the materialized stats tables). `qterms` must be
   * distinct (query_id, term) rows, persisted by the caller (three
   * consumers: pass-1 join, expansion anti-join, union). */
  private def prfRanked(tf: DataFrame, dfreq: DataFrame, dl: DataFrame,
      n: Long, s: Long, qterms: DataFrame,
      k: Int, fbDocs: Int, expTerms: Int): DataFrame = {
    val fb = rankedScores(tf, dfreq, dl, n, s, None, qterms, fbDocs)
      .select(col("query_id"), col("doc_id"))
    val expw = fb.join(tf, Seq("doc_id"))
      .join(dfreq, Seq("term"))
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf") * col("idf_i")).as("w_exp"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
    val ew = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("w_exp").desc, col("term"))
    val expTop = expw.withColumn("_er", row_number().over(ew))
      .filter(col("_er") <= expTerms)
      .select(col("query_id"), col("term"))

    val q2 = qterms.select(col("query_id"), col("term")).unionByName(expTop)
    rankedScores(tf, dfreq, dl, n, s, None, q2, k)
  }

  /** PRF served from [[writeIndexTables]] output — identical rankings
   * to [[bm25PrfTopK]] over the corpus the index was built from,
   * without re-tokenizing anything (the r6 serve contract, for the
   * expansion path). Delegates to [[bm25PrfTopKFromStats]]: corpus
   * stats come from the materialized `_stats`/`_df` tables, so
   * NEITHER pass (nor the feedback mine) rescans the postings or
   * doc-length tables for N/S/df. */
  def bm25PrfTopKFromTables(spark: org.apache.spark.sql.SparkSession,
      name: String, queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, fbDocs: Int = 5, expTerms: Int = 3,
      maxDfFrac: Double = 0.5): DataFrame =
    bm25PrfTopKFromStats(spark, name, queries, qKeyCol, qTermsCol,
      k, fbDocs, expTerms, maxDfFrac)

  /** [[bm25PrfTopKFromTables]], explicitly: both scoring passes and
   * the expansion mine run against the standing index with (N, S)
   * read from the 1-row `_stats` table and idf derived from the
   * vocabulary-sized `_df` table — the PRF serve path pays ZERO
   * stats passes over postings/doclen per call (it used to pay the
   * rescan twice, once per pass). */
  def bm25PrfTopKFromStats(spark: org.apache.spark.sql.SparkSession,
      name: String, queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, fbDocs: Int = 5, expTerms: Int = 3,
      maxDfFrac: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(expTerms >= 0, s"expTerms must be >= 0, got $expTerms")
    val (n, s) = readStats(spark, name)
    val dfreq = idfFromDf(spark.table(s"${name}_df"), n, maxDfFrac)
    // eager row blocks — three concurrent consumers (AQE note)
    val qterms = Stage.eager(queries.select(col(qKeyCol).as("query_id"),
        explode(array_distinct(col(qTermsCol))).as("term")))
    ownStages(qterms)(
      prfRanked(spark.table(s"${name}_postings"), dfreq,
        spark.table(s"${name}_doclen"), n, s, qterms, k, fbDocs, expTerms))
  }

  /**
   * Materialize the inverted index as BUCKETED tables — the standing
   * serve path for a repeated query workload ([[SCALE.md]]'s "pay the
   * tokenize once" recipe). Four tables:
   *  - `_postings` (doc_id, term, tf), bucket+sort on `term` — only
   *    matched posting rows ever shuffle at query time;
   *  - `_doclen` (doc_id, dl), bucketed on `doc_id` (its join key);
   *  - `_df` (term, df), bucket+sort on `term` — document frequency
   *    materialized ONCE, derived from the just-written postings
   *    buckets with no exchange (the WarehouseSpec bucketed-agg
   *    property) and no second tokenize;
   *  - `_stats` — one row (n, s): corpus size and total token mass.
   * The `_df`/`_stats` pair is what makes serving fit-free: at a
   * standing 100 TB index, recomputing N/S/df per query batch is an
   * O(index) scan that dominates the serve cost — materialized, a
   * query batch touches only its matched posting lists. Pay tokenize
   * + the clustered writes once; serve from [[bm25TopKFromStats]] /
   * [[bm25PrfTopKFromStats]] after.
   */
  def writeIndexTables(docs: DataFrame, keyCol: String, textCol: String,
      name: String, buckets: Int = 32): Unit = {
    val (tf, dl) = postingsOf(docs, keyCol, textCol)
    writeIndexTablesFrom(docs.sparkSession, tf, dl, name, buckets)
  }

  /** [[writeIndexTables]] from a PREBUILT (doc_id, term, tf) /
   * (doc_id, dl) index — the publish step for indexes that never came
   * from a one-shot document scan: a
   * [[graft.streaming.StreamingRetrieval]] snapshot publishes its
   * collapsed store into the bucketed serve tables, closing the
   * fit/serve duality for streamed corpora (tokenize paid per
   * micro-batch at ingest, clustered layout + stats paid once per
   * publish, every query after served fit-free by
   * [[bm25TopKFromStats]]). */
  def writeIndexTablesFrom(spark: org.apache.spark.sql.SparkSession,
      tf: DataFrame, dl: DataFrame, name: String, buckets: Int = 32): Unit = {
    // a crashed previous build (or a catalog-fresh session over an old
    // warehouse dir) leaves an orphan table LOCATION that Overwrite
    // cannot claim — drop both catalog entry and location first
    Seq(s"${name}_postings", s"${name}_doclen", s"${name}_df",
        s"${name}_stats").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    tf.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_postings")
    dl.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "doc_id")
      .saveAsTable(s"${name}_doclen")
    // stats derive from the tables just written (not from tf/dl, whose
    // lineage would tokenize the corpus twice more): the df agg reads
    // pre-clustered term buckets exchange-free, the (n, s) pair is one
    // O(doclen) pass at BUILD time so no serve call ever pays it
    spark.table(s"${name}_postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "term").sortBy("term")
      .saveAsTable(s"${name}_df")
    spark.table(s"${name}_doclen")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_stats")
  }

  /** The (N, S) pair of a materialized index — one 1-row table read. */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
      name: String): (Long, Long) = {
    val st = spark.table(s"${name}_stats").head()
    val (n, s) = (st.getAs[Long]("n"), st.getAs[Long]("s"))
    require(n > 0 && s > 0, "bm25 needs a non-empty, non-blank corpus")
    (n, s)
  }

  /** BM25 top-k served from [[writeIndexTables]] output — identical
   * rankings to [[bm25TopK]] over the corpus the index was built
   * from, without re-tokenizing anything. Delegates to
   * [[bm25TopKFromStats]] (requires an index written by a version
   * that materializes the `_df`/`_stats` tables). */
  def bm25TopKFromTables(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double = 0.5): DataFrame =
    bm25TopKFromStats(spark, name, queries, qKeyCol, qTermsCol, k, maxDfFrac)

  /** The fit-free serve path: rank against the standing index with
   * corpus stats read from the materialized tables — (N, S) from the
   * 1-row `_stats` table, the guard + idf from the vocabulary-sized
   * `_df` table. NO aggregate ever runs over the postings or
   * doc-length tables at serve time (plan-asserted in PlanSpec): a
   * query batch costs its matched posting lists, independent of the
   * standing index size — the fit-once/serve-many discipline. */
  def bm25TopKFromStats(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, qKeyCol: String, qTermsCol: String,
      k: Int, maxDfFrac: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDfFrac > 0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val (n, s) = readStats(spark, name)
    val dfreq = idfFromDf(spark.table(s"${name}_df"), n, maxDfFrac)
    val qterms = queries.select(col(qKeyCol).as("query_id"),
      explode(array_distinct(col(qTermsCol))).as("term"))
    // own the (queries × k)-sized result like every other family
    // member: repeated actions on the same batch read the persisted
    // top-k instead of re-running the posting join
    ownStages()(rankedScores(spark.table(s"${name}_postings"), dfreq,
      spark.table(s"${name}_doclen"), n, s, None, qterms, k))
  }

  /** Self-retrieval reciprocal rank — the retrieval-quality eval over
   * a corpus-derived query set (does a document's own query find it,
   * and at what rank?): one row per query whose source document made
   * the top-k, rr_micro = ⌊10⁶/rank⌋ (exact integers; average them
   * for MRR). A missing row IS the signal — the self doc fell out of
   * the top-k entirely. */
  def selfRetrievalRR(topk: DataFrame): DataFrame =
    topk.filter(col("doc_id") === col("query_id"))
      .select(col("query_id"), col("rank").as("self_rank"),
        floor(lit(1000000.0) / col("rank").cast("double")).cast("long")
          .as("rr_micro"))

  /**
   * Reciprocal-rank fusion of ranked retrieval arms — the standard
   * hybrid-retrieval combiner (lexical BM25 × dense ANN is the RAG /
   * hard-negative-mining workhorse). Each arm is a (query_id, doc_id,
   * rank) DataFrame — [[bm25TopK]], [[Similarity.bruteForceTopK]] or
   * `Similarity.ivfTopKIndexed` output shapes all fit (rename the id
   * column); the fusion is arm-agnostic, so the scale path is simply
   * swapping the brute-force arm for the IVF-served one.
   *
   * score(q, d) = Σ_arms ⌊10⁶ / (c + rank_arm(q, d))⌋, missing arms
   * contribute 0 — each term is one IEEE division of exact integers
   * behind a floor, summed as BIGINTs, so fusion is exactly
   * reproducible cross-engine (same discipline as [[bm25TopK]]).
   * Ties break on doc_id. c = 60 is the conventional RRF constant.
   *
   * Scale shape: input arms are already top-k' (queries × k' rows —
   * tiny next to the corpora that produced them); the fuse is one
   * union + one (query, doc)-keyed partial agg + a WindowGroupLimit
   * top-k. Cost is O(queries · k' · arms) regardless of corpus size.
   */
  def rrfFuse(arms: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    require(k >= 1, s"k must be >= 1, got $k")
    val contrib = arms.map(_.select(col("query_id"), col("doc_id"),
        floor(lit(1000000.0) / (col("rank") + lit(c)).cast("double"))
          .cast("long").as("_m")))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_m")).as("rrf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_micro"),
        col("rank").cast("int").as("rank"))
  }

  /**
   * Hard-negative mining — the contrastive-training composition over
   * the retrieval + dedup stacks: from a ranked candidate list
   * (query_id, doc_id, score_micro, ...) keep the candidates that are
   * lexically CLOSE (they ranked) but NOT near-duplicates of the query
   * document (they would be false negatives), re-ranked densely 1..k.
   * `query_id` is a document id (self-query mining — the r1/r3 shape);
   * the near-dup verdicts come in as unordered (aCol, bCol) pairs from
   * any of the Dedup pair generators.
   *
   * Scale shape: candidates are queries × k' rows and the pair list is
   * the dedup output — the anti-join is tiny next to either producer;
   * orientation-normalized keys (least/greatest) make it one hash
   * anti-join, and the dense re-rank is a WindowGroupLimit heap.
   */
  def hardNegatives(candidates: DataFrame, nearDupPairs: DataFrame,
      aCol: String, bCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = nearDupPairs.select(
      least(col(aCol), col(bCol)).as("_lo"),
      greatest(col(aCol), col(bCol)).as("_hi"))
    val kept = candidates
      .filter(col("doc_id") =!= col("query_id"))
      .join(pairs,
        least(col("query_id"), col("doc_id")) === col("_lo") &&
          greatest(col("query_id"), col("doc_id")) === col("_hi"),
        "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    kept.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score_micro"),
        col("neg_rank").cast("int").as("neg_rank"))
  }

  /** Derive a deterministic query set from the corpus itself: every
   * doc whose key ≡ 0 (mod `every`) becomes a query made of the
   * DISTINCT first `nTerms` tokens of its text. Blank docs yield a
   * query with no terms (and thus no results) rather than an error. */
  def selfQueries(docs: DataFrame, keyCol: String, textCol: String,
      every: Int = 97, nTerms: Int = 8): DataFrame =
    docs.filter(col(keyCol) % every === 0)
      .select(col(keyCol).as("query_id"),
        array_distinct(slice(TextAnalysis.tokens(col(textCol)), 1, nTerms))
          .as("terms"))

  /** Per-rank nDCG discounts ⌊10⁶ / log₂(rank+1)⌋ FROZEN as integer
   * literals (ranks 1..10) — the t19/lmTermNanos discipline: log₂ is
   * the one environment-sensitive operation in the metric, so it is
   * evaluated once here and never at query time, making every
   * DCG term an exact integer product any engine reproduces. */
  val NdcgDiscountMicro: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /**
   * Graded-relevance retrieval eval — nDCG@k over a labeled ranking:
   * input rows (query_id, doc_id, rank ∈ [1, k], rel ≥ 0), one output
   * row per query with
   *   dcg_micro  = Σ gain(rel) · D(rank),
   *   idcg_micro = Σ gain(rel) · D(ideal position)   (gains re-sorted
   *                descending within the query, ties on doc_id),
   *   ndcg       = round(dcg/idcg, 6)  (0 when idcg = 0),
   * with gain(rel) = 2^rel − 1 and D the frozen
   * [[NdcgDiscountMicro]] literals — DCG/IDCG are exact integers, the
   * single double division + round is the d21-recall idiom. The ideal
   * ordering is over the RETRIEVED set (a ranking-quality metric for
   * the k nominations; corpus-wide ideal would need the full label
   * space). MRR (r4) scores the one true doc; this is what production
   * retrieval tuning reads over graded judgments.
   *
   * Scale shape: input is queries × k rows — the eval never touches
   * the corpus; one window + one aggregation, both keyed on query_id.
   */
  def ndcgAtK(labeled: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgDiscountMicro.length,
      s"k must be in [1, ${NdcgDiscountMicro.length}], got $k")
    val disc = typedLit(NdcgDiscountMicro)
    // the Column API's shiftleft only takes a literal shift — the SQL
    // form accepts a column one
    val gain = expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT)) - 1 AS BIGINT)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_gain").desc, col("doc_id"))
    val g = labeled
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as("rank"), gain.as("_gain"))
      .withColumn("_ipos", row_number().over(w))
    val agg = g.groupBy(col("query_id")).agg(
      sum(col("_gain") * element_at(disc, col("rank"))).cast("long")
        .as("dcg_micro"),
      sum(col("_gain") * element_at(disc, col("_ipos"))).cast("long")
        .as("idcg_micro"))
    agg.select(col("query_id"), col("dcg_micro"), col("idcg_micro"),
      when(col("idcg_micro") === 0, lit(0.0))
        .otherwise(round(col("dcg_micro").cast("double") /
          col("idcg_micro").cast("double"), 6)).as("ndcg"))
  }

  /**
   * Cross-encoder rerank — the second retrieval stage: a first-stage
   * candidate list (`fused`: (query_id, doc_id, …) — [[rrfFuse]],
   * [[bm25TopK]] or any top-k shape) is re-scored by a JOINT
   * (query, document) model behind the [[CrossEncoderLoader]] seam
   * and renumbered 1..k on (ce_micro DESC, doc_id). Candidates the
   * model scores 0 (no overlap, empty query) are KEPT and ranked,
   * and so are candidates whose doc_id is ABSENT from `docs` (a
   * first-stage arm can nominate an id the document table no longer
   * carries — e.g. a dense index built before a corpus re-cut):
   * those score 0, the oracle's `LEFT JOIN + coalesce(0)` semantics —
   * rerank reorders the first stage's nominations, it never invents
   * or silently drops one.
   *
   * Scale shape: candidates are queries × k rows — tiny — so the
   * (candidates × queries) join stays driver-free and the join
   * against the corpus BROADCASTS the candidate side (one corpus
   * scan, zero corpus shuffle; only candidate rows carry text into
   * the scorer). The model loads once per partition, scores
   * `maxBatch`-pair slices, and closes at task completion — the
   * [[EmbeddingPipeline.embedMedia]] lifecycle. The final top-k is a
   * WindowGroupLimit heap over queries × k rows.
   */
  def crossEncoderRerank(fused: DataFrame, queries: DataFrame,
      docs: DataFrame, keyCol: String, textCol: String,
      loader: CrossEncoderLoader, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = fused.sparkSession
    import spark.implicits._
    val cand = broadcast(
      fused.select(col("query_id"), col("doc_id"))
        .join(queries.select(col("query_id"), col("terms")), Seq("query_id")))
    val scoredRaw = cand
      .join(docs.select(col(keyCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("_toks")), Seq("doc_id"))
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("terms"), col("_toks"))
      .as[(Long, Long, Seq[String], Seq[String])]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val model = loader.load()
          require(model.maxBatch > 0,
            s"model ${model.name} declares maxBatch=${model.maxBatch}; must be positive")
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => model.close()))
          rows.grouped(model.maxBatch).flatMap { batch =>
            val scores = model.scoreBatch(
              batch.map(r => (r._3.toArray, r._4.toArray)).toArray)
            batch.iterator.zip(scores.iterator).map { case ((q, d, _, _), s) =>
              (q, d, s)
            }
          }
        }
      }
      .toDF("query_id", "doc_id", "ce_micro")
    // materialized (eager row blocks) because TWO branches read it
    // (the kept scores and the missing-candidate recovery below) and
    // AQE materializes them concurrently — a lazy cache block would be
    // rebuilt by each, re-running the MODEL FORWARD PASS twice
    // (profiled: r10's dominant CPU). Stage.eager runs the scorer
    // exactly once, without the columnar encode/decode or the separate
    // blocking count the r16 persist+count form paid.
    val scored = Stage.eager(scoredRaw)
    // candidates the corpus join dropped (nominated doc_id absent from
    // `docs`): kept with score 0 — a preserved-side broadcast outer
    // join doesn't exist in BroadcastHashJoin, so the left join the
    // oracle writes is realized as inner join + tiny×tiny anti-join
    // recovery (both sides are queries × k rows; the corpus still
    // scans once and never shuffles)
    val missing = cand
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"))
      .join(scored.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      .withColumn("ce_micro", lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ce_micro").desc, col("doc_id"))
    // the family's stage-ownership discipline: the returned top-k is
    // persisted+materialized while the scored row blocks are live,
    // then the blocks are released — repeated actions on the result
    // read its own cache and never re-run the corpus scan or scorer
    ownStages(scored)(
      scored.unionByName(missing).withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("doc_id"), col("ce_micro"),
          col("rank").cast("int").as("rank")))
  }
}
