package graft

/** Driver-contract smoke: entry() returns rows on sf0.001 and every
  * declared query runs there. */
class EntrySmokeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and every oracle key has a query") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    // every query is oracle-backed except the GENERATED-oracle set —
    // all of these get literal SQL from dynamicOracleSql at Verify
    // time (centroid fits, the reference BPE refit, the ln-term
    // freeze, the unrolled PageRank), so since round 9 the driver
    // hash-checks EVERY query: zero genuinely rows-only checks remain
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("n3_ann_ivf", "n11_ann_filtered", "n6_ann_ivf_sq8", "n7_ann_pq",
      "n8_ann_ivf_pq", "e2_kmeans_step", "e3_semdedup", "e4_knn_graph",
      "n10_ann_ivf_rpq", "e5_semdedup_xcell", "e6_knn_graph_xcell",
      "e7_cell_balanced_sample", "e8_ann_recall", "e9_cell_stats", "e10_probe_sweep",
      "e11_knn_pagerank", "e12_knn_graph_canonical",
      "t19_lm_perplexity", "t22_bpe_merges", "t23_bpe_tokenize",
      // the retrieval family + d17 ship their idf/centroid literal
      // tables via dynamicOracleSql (the r11 libm-portability fix)
      "r1_bm25_topk", "r2_hybrid_rrf", "r3_hard_negatives",
      "r4_self_retrieval_rr", "r5_bm25_filtered", "r6_bm25_served",
      "r7_bm25_prf", "r8_bm25_prf_served", "r9_hybrid_rrf_indexed",
      "r10_rerank", "r11_ndcg", "d17_semantic_decon"),
      s"unexpected rows-only queries: $rowsOnly")
    // and the dynamic set must cover exactly those — no query without
    // SOME oracle
    val dyn = SparkEntry.dynamicOracleSql(spark, sf).keySet
    assert((rowsOnly -- dyn).isEmpty,
      s"queries with neither static nor generated oracle: ${rowsOnly -- dyn}")
  }

  test("GlobalRank-backed queries leave no cached RDDs after action + release (census)") {
    val sc = spark.sparkContext
    graft.functions.GlobalRank.releaseStaged()
    spark.catalog.clearCache()
    val before = sc.getPersistentRDDs.keySet
    // the three call sites that stage a persisted sort per invocation.
    // Hold strong references to the results through the census: the
    // registry is WEAK by contract, so a discarded result's staged
    // lineage may be GC-reclaimed before releaseStaged() counts it.
    val results = Seq("o3_name_sort_rank", "t32_training_order",
      "x11_downtime_pareto").map(q => SparkEntry.queries(q)(spark, sf))
    results.foreach(_.count())
    assert(graft.functions.GlobalRank.releaseStaged() >= 3,
      "each GlobalRank call site must register its staged sort")
    assert(results.nonEmpty) // keep `results` live past the census
    spark.catalog.clearCache()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "o3/t32/x11 must leave nothing cached after release")
  }
}
