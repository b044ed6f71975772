package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // 6-doc corpus: "zebra" is rare (docs 1,2), "alpha" is everywhere
  // (stop-guarded: df=6, 12 > 6), "gamma" mid-frequency (docs 3,4,5)
  private def docs = Seq(
    (1L, "alpha zebra beta beta"),
    (2L, "alpha zebra zebra gamma gamma gamma gamma gamma gamma"),
    (3L, "alpha gamma beta"),
    (4L, "alpha gamma delta"),
    (5L, "alpha gamma epsilon epsilon"),
    (6L, "alpha beta delta epsilon"))
    .toDF("doc_id", "text")

  private def q(terms: String*) =
    Seq((100L, terms)).toDF("query_id", "terms")

  test("rare query term retrieves exactly its posting list, ranked") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    // doc 1 is shorter with tf=1; doc 2 has tf=2 but is much longer —
    // verify ranks exist and are 1..2 (exact order checked vs scoring below)
    assert(out.values.toSet == Set(1, 2))
  }

  test("stop-guarded term (in every doc) contributes nothing") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q("alpha"),
      "query_id", "terms", k = 10).count()
    assert(out == 0L)
  }

  test("higher-tf doc of the same length ranks first; k caps output") {
    val d = Seq(
      (1L, "x y y y filler one"),
      (2L, "x x y y filler two"),
      (3L, "x x x y filler tri"),
      (4L, "w w w w filler quo"),
      (5L, "v v v v filler cinq"),
      (6L, "u u u u filler six"),
      (7L, "t t t t filler sept")) // df(x)=3, N=7: below the stop guard
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, "doc_id", "text", q("x"),
      "query_id", "terms", k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(3L, 2L)) // tf 3 > tf 2 > tf 1, capped at k=2
  }

  test("multi-term scores are the exact sum of single-term micro-scores") {
    def scores(terms: String*): Map[Long, Long] =
      Retrieval.bm25TopK(docs, "doc_id", "text", q(terms: _*),
        "query_id", "terms", k = 10)
        .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val zebra = scores("zebra")
    val gamma = scores("gamma")
    val both = scores("zebra", "gamma")
    for ((id, s) <- both)
      assert(s == zebra.getOrElse(id, 0L) + gamma.getOrElse(id, 0L),
        s"doc $id: ${zebra.get(id)} + ${gamma.get(id)} != $s")
  }

  test("duplicate query terms collapse (set semantics)") {
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", q("zebra", "zebra"),
      "query_id", "terms", k = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toSet
    val b = Retrieval.bm25TopK(docs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("result is invariant under input repartitioning (exact sums)") {
    val base = Retrieval.bm25TopK(docs, "doc_id", "text",
      q("zebra", "gamma", "beta"), "query_id", "terms", k = 10)
      .collect().toSet
    val shuffled = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text",
      q("zebra", "gamma", "beta").repartition(3), "query_id", "terms", k = 10)
      .collect().toSet
    assert(base == shuffled)
  }

  test("selfQueries: every-97th docs, distinct first-8 tokens; blank-safe") {
    val d = Seq((0L, "a b a b c"), (97L, ""), (50L, "unused text here"))
      .toDF("doc_id", "text")
    val qs = Retrieval.selfQueries(d, "doc_id", "text")
      .select("query_id", "terms").as[(Long, Seq[String])].collect().toMap
    assert(qs.keySet == Set(0L, 97L))
    assert(qs(0L) == Seq("a", "b", "c"))
    assert(qs(97L).isEmpty)
    // blank query produces no results rather than failing
    val out = Retrieval.bm25TopK(d, "doc_id", "text",
      Retrieval.selfQueries(d, "doc_id", "text").filter(col("query_id") === 97L),
      "query_id", "terms", k = 5)
    assert(out.count() == 0L)
  }

  test("rrfFuse: exact micro-contributions, missing arms contribute 0") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val den = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .select("doc_id", "rrf_micro", "rank").as[(Long, Long, Int)]
      .collect().sortBy(_._1)
    def m(r: Int) = math.floor(1000000.0 / (r + 60)).toLong
    // doc 10: lex rank1 + dense rank2 (32522); doc 12: dense rank1
    // (16393); doc 11: lex rank2 (16129)
    assert(out.toSeq == Seq(
      (10L, m(1) + m(2), 1),
      (11L, m(2), 3),
      (12L, m(1), 2)))
  }

  test("rrfFuse ranks by fused score then doc_id; k caps per query") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (2L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // q1: doc 11 (ranks 2+1 → 16129+16393) beats doc 10 (16393)
    // q2: docs 20/21 tie (16393 each) → doc_id asc wins
    assert(out == Set((1L, 11L), (2L, 20L)))
  }

  test("rrfFuse invariant under arm order and repartitioning") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 12L, 1), (1L, 10L, 2)).toDF("query_id", "doc_id", "rank")
    val x = Retrieval.rrfFuse(Seq(a, b), k = 5).collect().toSet
    val y = Retrieval.rrfFuse(Seq(b.repartition(4), a.repartition(3)), k = 5)
      .collect().toSet
    assert(x == y)
  }

  test("hardNegatives drops self + near-dups in either orientation, re-ranks densely") {
    val cands = Seq(
      (1L, 1L, 500L, 1),  // self — dropped
      (1L, 2L, 400L, 2),  // near-dup of 1 (pair 1<2) — dropped
      (1L, 3L, 300L, 3),  // kept → neg_rank 1
      (1L, 4L, 300L, 4),  // kept, score tie → doc_id breaks → neg_rank 2
      (1L, 5L, 100L, 5),  // near-dup listed reversed (5,1) — dropped
      (1L, 6L, 50L, 6))   // kept → neg_rank 3
      .toDF("query_id", "doc_id", "score_micro", "rank")
    val pairs = Seq((1L, 2L), (5L, 1L)).toDF("doc_a", "doc_b")
    val out = Retrieval.hardNegatives(cands, pairs, "doc_a", "doc_b", k = 2)
      .select("doc_id", "neg_rank").as[(Long, Int)].collect().toSet
    assert(out == Set((3L, 1), (4L, 2))) // k=2 caps doc 6 out
  }

  test("bucketed index tables serve identical rankings; bucket agg is exchange-free") {
    val d = docs
    Retrieval.writeIndexTables(d, "doc_id", "text", "rix_test", buckets = 4)
    val q = Seq((100L, Seq("zebra", "gamma", "beta"))).toDF("query_id", "terms")
    val direct = Retrieval.bm25TopK(d, "doc_id", "text", q, "query_id", "terms", k = 10)
      .collect().toSet
    val served = Retrieval.bm25TopKFromTables(spark, "rix_test", q,
      "query_id", "terms", k = 10).collect().toSet
    assert(served === direct)
    // the writer's layout property: the vocabulary-sized term agg over
    // the bucketed postings needs NO exchange
    val agg = spark.table("rix_test_postings").groupBy(col("term")).count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
    // the serve-path property: stats come from the materialized
    // _stats/_df tables — NO aggregate over the postings (df) and no
    // term-keyed aggregate anywhere in the serve plan
    val servePlan = Retrieval.bm25TopKFromStats(spark, "rix_test", q,
      "query_id", "terms", k = 10).queryExecution.executedPlan.toString
    assert(!servePlan.contains("keys=[term#"), servePlan.take(1500))
    assert(servePlan.contains("rix_test_df"), servePlan.take(1500))
    // the materialized df/stats tables match a from-scratch derivation
    val dfTab = spark.table("rix_test_df").as[(String, Long)].collect().toMap
    val (tfRef, dlRef) = Retrieval.postingsOf(d, "doc_id", "text")
    val dfRef = tfRef.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    assert(dfTab == dfRef)
    val st = spark.table("rix_test_stats").as[(Long, Long)].collect().head
    assert(st == ((dlRef.count(), dlRef.agg(sum(col("dl"))).head().getLong(0))))
    Seq("postings", "doclen", "df", "stats")
      .foreach(t => spark.sql(s"DROP TABLE rix_test_$t"))
    spark.catalog.clearCache()
  }

  test("selfRetrievalRR: exact reciprocal micro-ranks; absent = fell out of top-k") {
    val topk = Seq(
      (1L, 1L, 900L, 1),  // self at rank 1 → rr 1000000
      (1L, 9L, 800L, 2),
      (2L, 5L, 700L, 1),
      (2L, 2L, 600L, 3))  // self at rank 3 → rr 333333
      .toDF("query_id", "doc_id", "score_micro", "rank")
    val out = Retrieval.selfRetrievalRR(topk)
      .select("query_id", "self_rank", "rr_micro").as[(Long, Int, Long)]
      .collect().toSet
    assert(out == Set((1L, 1, 1000000L), (2L, 3, 333333L)))
  }

  test("filtered retrieval: only allowed docs rank; scores filter-invariant") {
    val qs = q("zebra", "gamma")
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", qs,
      "query_id", "terms", k = 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val allowed = docs.filter(col("doc_id").isin(2L, 3L, 5L))
    val filt = Retrieval.bm25TopKFiltered(docs, "doc_id", "text",
      allowed, "doc_id", qs, "query_id", "terms", k = 10)
      .select("doc_id", "score_micro", "rank").as[(Long, Long, Int)]
      .collect()
    assert(filt.map(_._1).toSet.subsetOf(Set(2L, 3L, 5L)))
    // global stats: a doc's score is identical inside the filter
    for ((id, sm, _) <- filt) assert(sm == full(id), s"doc $id: $sm != ${full(id)}")
    // ranks are dense over the filtered set
    assert(filt.map(_._3).sorted.toSeq == (1 to filt.length))
  }

  test("idfOf matches the floor-quantized ln formula; margins locate the boundary") {
    val (tf, dl) = Retrieval.postingsOf(docs, "doc_id", "text")
    val n = dl.count()
    val idf = Retrieval.idfOf(tf, n, maxDfFrac = 1.0)
      .as[(String, Long)].collect().toMap
    // df per term from first principles
    val dfm = tf.groupBy("term").count().as[(String, Long)].collect().toMap
    assert(idf.keySet == dfm.keySet)
    dfm.foreach { case (t, df) =>
      val exp = math.floor(1e4 * math.log(
        (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)).toLong
      assert(idf(t) == exp, s"term $t df=$df")
    }
    // margins: same idf_i, margin in (0, 0.5], and consistent with the
    // raw value's distance to its floor boundaries — the attribution
    // diagnostic the oracle generator emits per sf dir
    val m = Retrieval.idfBoundaryMargins(tf, n, maxDfFrac = 1.0)
      .as[(String, Long, Long, Double)].collect()
    assert(m.map(_._1).toSet == dfm.keySet)
    m.foreach { case (t, df, idfI, margin) =>
      assert(idfI == idf(t), s"term $t")
      val f = 1e4 * math.log((n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
      val exp = math.min(f - math.floor(f), 1.0 - (f - math.floor(f)))
      assert(math.abs(margin - exp) < 1e-9 && margin > 0 && margin <= 0.5, s"term $t")
    }
    // the guard applies to margins too: a maxDfFrac that stops a term
    // removes it from BOTH tables identically
    val guarded = Retrieval.idfOf(tf, n, maxDfFrac = 0.9).as[(String, Long)].collect().toMap
    val guardedM = Retrieval.idfBoundaryMargins(tf, n, maxDfFrac = 0.9)
      .select("term").as[String].collect().toSet
    assert(guarded.keySet == guardedM && !guarded.contains("alpha"))
  }

  test("staged tf cache is released after the call") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Retrieval.bm25TopK(docs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 3).collect()
    // the persisted top-k result itself stays cached (ownStages returns
    // it materialized); the tf stage must be gone
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1)
    spark.catalog.clearCache()
  }

  // ---- PRF query expansion ----------------------------------------------

  // df(zebra)=1, df(lion)=2, df(moose)=2, df(alpha)=3 > maxDf=2 at
  // maxDfFrac=0.5 (guarded). Doc 1 is the only zebra doc, so it is the
  // sole feedback doc for the query; its candidate expansion terms are
  // lion (tf=2) and moose (tf=1), same df ⇒ lion is strictly heavier.
  private def prfDocs = Seq(
    (1L, "zebra lion lion moose"),
    (2L, "lion alpha savanna"),
    (3L, "moose alpha tundra"),
    (4L, "alpha beta gamma delta"))
    .toDF("doc_id", "text")

  test("prf with expTerms = 0 is exactly plain bm25") {
    val plain = Retrieval.bm25TopK(docs, "doc_id", "text",
      q("zebra", "gamma"), "query_id", "terms", k = 10)
      .collect().map(_.toSeq).toSet
    val prf = Retrieval.bm25PrfTopK(docs, "doc_id", "text",
      q("zebra", "gamma"), "query_id", "terms", k = 10, fbDocs = 3,
      expTerms = 0)
      .collect().map(_.toSeq).toSet
    assert(prf == plain)
    spark.catalog.clearCache()
  }

  test("prf expansion retrieves docs the raw query cannot reach") {
    val plain = Retrieval.bm25TopK(prfDocs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L)) // zebra only appears in doc 1
    val prf = Retrieval.bm25PrfTopK(prfDocs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 1)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    // expTerms=1 selects lion (w_exp = 2·idf) over moose (1·idf):
    // doc 2 (lion) joins the result set, doc 3 (moose) does not
    assert(prf.keySet == Set(1L, 2L), s"got $prf")
    assert(prf(1L) == 1) // the feedback doc still dominates
    spark.catalog.clearCache()
  }

  test("prf expansion weights rank candidate terms by sum(tf*idf), ties on term") {
    // equal weights: doc 1 feedback, candidates "aa" and "bb" both
    // tf=1 and df=2 — tie broken on term asc, so "aa" is selected
    val d = Seq(
      (1L, "zebra aa bb"),
      (2L, "aa east"),
      (3L, "bb west"),
      (4L, "filler one two"),
      (5L, "filler three four"))
      .toDF("doc_id", "text")
    val prf = Retrieval.bm25PrfTopK(d, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(prf == Set(1L, 2L), s"got $prf") // aa ⇒ doc 2, not bb/doc 3
    spark.catalog.clearCache()
  }

  test("prf result is invariant under input repartitioning") {
    val a = Retrieval.bm25PrfTopK(prfDocs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 2)
      .collect().map(_.toSeq).toSet
    val b = Retrieval.bm25PrfTopK(prfDocs.repartition(7), "doc_id", "text",
      q("zebra"), "query_id", "terms", k = 10, fbDocs = 5, expTerms = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("prf served from the bucketed tables equals the direct operator") {
    Retrieval.writeIndexTables(prfDocs, "doc_id", "text", "rix_prf", buckets = 4)
    val direct = Retrieval.bm25PrfTopK(prfDocs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 2)
      .collect().map(_.toSeq).toSet
    val served = Retrieval.bm25PrfTopKFromTables(spark, "rix_prf", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 2)
      .collect().map(_.toSeq).toSet
    assert(served === direct)
    // the PRF serve plan must not rescan postings/doclen for stats
    // either — no term-keyed aggregate in either pass
    val servePlan = Retrieval.bm25PrfTopKFromStats(spark, "rix_prf", q("zebra"),
      "query_id", "terms", k = 10, fbDocs = 5, expTerms = 2)
      .queryExecution.executedPlan.toString
    assert(!servePlan.contains("keys=[term#"), servePlan.take(1500))
    Seq("postings", "doclen", "df", "stats")
      .foreach(t => spark.sql(s"DROP TABLE rix_prf_$t"))
    spark.catalog.clearCache()
  }

  test("prf staged caches are released after the call") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Retrieval.bm25PrfTopK(prfDocs, "doc_id", "text", q("zebra"),
      "query_id", "terms", k = 3, fbDocs = 2, expTerms = 2).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1) // only the materialized result remains
    spark.catalog.clearCache()
  }

  /** The integer-division score, recomputed independently with BigInt —
   * the reference the engine's DECIMAL(38,0) `div` and the oracle's
   * HUGEINT `//` must both equal. */
  private def refScore(idfI: Long, tf: Long, dl: Long, n: Long, s: Long): BigInt =
    (BigInt(2200) * idfI * tf * s) /
      (BigInt(10) * s * tf + BigInt(3) * s + BigInt(9) * dl * n)

  test("score_micro is the exact BigInt integer-division value (no float anywhere)") {
    val (tfDf, dlDf) = Retrieval.postingsOf(docs, "doc_id", "text")
    val dl = dlDf.as[(Long, Long)].collect().toMap
    val n = dl.size.toLong
    val s = dl.values.sum
    val idf = Retrieval.idfOf(tfDf, n, maxDfFrac = 1.0)
      .as[(String, Long)].collect().toMap
    val tf = tfDf.as[(Long, String, Long)].collect()
      .map { case (d, t, f) => ((d, t), f) }.toMap
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      q("zebra", "gamma", "beta"), "query_id", "terms",
      k = 10, maxDfFrac = 1.0)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(out.nonEmpty)
    for ((id, got) <- out) {
      val want = Seq("zebra", "gamma", "beta").flatMap { t =>
        for (f <- tf.get((id, t)); i <- idf.get(t))
          yield refScore(i, f, dl(id), n, s)
      }.sum
      assert(BigInt(got) == want, s"doc $id: $got != $want")
    }
  }

  test("adversarial magnitudes: S ~ 10^13 (int64-overflow range) scores exactly") {
    // dl sized so 2200·S·idf_i·tf ≈ 2·10^20 — far past the int64 max
    // (9.2·10^18); DECIMAL(38,0) must carry it exactly
    val tfIn = Seq((1L, "t", 5L), (2L, "t", 9999L), (2L, "u", 1L))
      .toDF("doc_id", "term", "tf")
    val dlIn = Seq((1L, 4000000000000L), (2L, 6000000000000L))
      .toDF("doc_id", "dl")
    val n = 2L
    val s = 10000000000000L
    val idf = Retrieval.idfOf(tfIn, n, maxDfFrac = 1.0)
      .as[(String, Long)].collect().toMap
    val out = Retrieval.bm25TopKFromIndex(tfIn, dlIn,
      Seq((9L, Seq("t", "u"))).toDF("query_id", "terms"),
      "query_id", "terms", k = 10, maxDfFrac = 1.0)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val want1 = refScore(idf("t"), 5L, 4000000000000L, n, s)
    val want2 = refScore(idf("t"), 9999L, 6000000000000L, n, s) +
      refScore(idf("u"), 1L, 6000000000000L, n, s)
    assert(BigInt(2200) * s * idf("t") * 9999L > BigInt(Long.MaxValue),
      "test must actually exceed the int64 range")
    assert(out == Map(1L -> want1.toLong, 2L -> want2.toLong))
    spark.catalog.clearCache()
  }

  test("ndcgAtK: hand-computed DCG/IDCG, perfect ordering, all-zero labels, rank>k dropped") {
    val D = Retrieval.NdcgDiscountMicro
    // q1: gains out of ideal order — (rank, rel): (1,0), (2,3), (3,1)
    // q2: already ideal — ndcg must be exactly 1.0
    // q3: nothing relevant — idcg 0 → ndcg 0.0 by definition
    // q4: has a rank-11 row that k=10 must drop
    val labeled = Seq(
      (1L, 101L, 1, 0), (1L, 102L, 2, 3), (1L, 103L, 3, 1),
      (2L, 201L, 1, 2), (2L, 202L, 2, 1),
      (3L, 301L, 1, 0), (3L, 302L, 2, 0),
      (4L, 401L, 1, 1), (4L, 402L, 11, 3))
      .toDF("query_id", "doc_id", "rank", "rel")
    val got = Retrieval.ndcgAtK(labeled, k = 10)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // gains: rel 3 → 7, 1 → 1; D is 1-indexed in rank
    val dcg1 = 0L * D(0) + 7L * D(1) + 1L * D(2)
    val idcg1 = 7L * D(0) + 1L * D(1) + 0L * D(2)
    assert(got(1L) === ((dcg1, idcg1,
      BigDecimal(dcg1.toDouble / idcg1.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L)._1 === got(2L)._2 && got(2L)._3 === 1.0,
      "ideal ordering must score exactly 1.0")
    assert(got(3L) === ((0L, 0L, 0.0)), "no relevant docs → ndcg defined 0")
    assert(got(4L) === ((1L * D(0), 1L * D(0), 1.0)),
      "ranks past k must not contribute")
    // k out of the frozen-literal range fails loud
    intercept[IllegalArgumentException](Retrieval.ndcgAtK(labeled, k = 11))
  }
}
