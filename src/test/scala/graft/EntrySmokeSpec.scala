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
    // every query is oracle-backed except the generated-oracle set
    // (centroid-literal SQL produced by dynamicOracleSql at Verify time)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("n3_ann_ivf", "n11_ann_filtered", "n6_ann_ivf_sq8", "n7_ann_pq",
      "n8_ann_ivf_pq", "e2_kmeans_step", "e3_semdedup", "e4_knn_graph",
      "n10_ann_ivf_rpq", "e5_semdedup_xcell", "e6_knn_graph_xcell",
      "e7_cell_balanced_sample", "e8_ann_recall", "e9_cell_stats", "e10_probe_sweep",
      // genuinely rows-only (no SQL mirror exists): float-log LM score,
      // iterative-argmax BPE fit + its apply — each pinned by a spec
      // against an independent reference implementation instead
      "t19_lm_perplexity", "t22_bpe_merges", "t23_bpe_tokenize"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
