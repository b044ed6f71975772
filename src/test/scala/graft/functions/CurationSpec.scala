package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private def docs() =
    spark.range(0, 200).select(
      col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 7).cast("string")).as("source"),
      ((col("id") % 13) + 1).cast("int").as("n_tok"))

  test("source cap keeps at most `cap` docs per source, ranks 1..cap") {
    val out = Curation.sourceCap(docs(), col("doc_id"), col("source"), cap = 5)
    val perSource = out.groupBy("source").agg(
      count(lit(1)).as("n"), max("cap_rank").as("mx"), min("cap_rank").as("mn"))
      .as[(String, Long, Int, Int)].collect()
    assert(perSource.length === 7)
    perSource.foreach { case (s, n, mx, mn) =>
      assert(n === 5L && mn === 1 && mx === 5, s"source $s")
    }
    // a source smaller than the cap survives whole
    val small = docs().filter(col("doc_id") < 3) // all in distinct sources
    assert(Curation.sourceCap(small, col("doc_id"), col("source"), 5).count() === 3L)
  }

  test("source cap is deterministic and partitioning-invariant") {
    def keep(parts: Int): Set[Long] =
      Curation.sourceCap(docs().repartition(parts), col("doc_id"), col("source"), 5)
        .select("doc_id").as[Long].collect().toSet
    assert(keep(1) === keep(8))
  }

  test("source cap plan is pruned by WindowGroupLimit before the full sort") {
    val plan = Curation.sourceCap(docs(), col("doc_id"), col("source"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("corpus diff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B!"), (4L, "d"), (9L, "new")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2, "doc_id", "text")
      .select(col("key"), col("change")).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((2L, "changed"), (3L, "removed"), (9L, "added")))
  }

  test("budget select keeps the best-score prefix within the token budget") {
    val scored = Seq(
      (1L, 0.9, 40L), (2L, 0.8, 50L), (3L, 0.7, 30L), (4L, 0.6, 100L), (5L, 0.5, 10L))
      .toDF("doc_id", "score", "n_tok")
    val out = Curation.budgetSelect(scored, col("doc_id"), col("score"), col("n_tok"), budget = 120L)
      .select("doc_id", "sel_rank", "cum_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    // greedy prefix: 40, 90, 120 fit; doc 4 (cum 220) and everything after are cut
    assert(out === Seq((1L, 1L, 40L), (2L, 2L, 90L), (3L, 3L, 120L)))
    // partitioning invariance
    val out8 = Curation.budgetSelect(scored.repartition(8), col("doc_id"), col("score"),
        col("n_tok"), budget = 120L)
      .select("doc_id", "sel_rank", "cum_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(out8 === out)
  }

  test("epoch expansion realizes the mixture weights in expectation") {
    val out = Curation.epochExpand(docs(), col("doc_id"), col("source"), col("n_tok"))
    val w = Curation.mixtureWeights(docs(), col("source"), col("n_tok"))
      .select("source", "mix_weight").as[(String, Double)].collect().toMap
    val reps = out.groupBy("source").agg(
        countDistinct("doc_id").as("n"), sum(lit(1)).as("rows"), max("n_rep").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    reps.foreach { case (s, n, rows, mx) =>
      // every replica count is floor(w) or floor(w)+1
      assert(mx <= math.floor(w(s)).toLong + 1, s"source $s")
      // realized copies per doc within 1 of the weight on average
      // (md5 gate is uniform; 200-doc strata keep the bound loose)
      val avg = rows.toDouble / math.max(n, 1)
      assert(math.abs(avg - w(s)) <= 1.0, s"source $s avg $avg vs ${w(s)}")
    }
    // rep_idx enumerates 1..n_rep per (doc, source)
    val bad = out.groupBy("doc_id", "n_rep").agg(
        min("rep_idx").as("mn"), max("rep_idx").as("mx"), count(lit(1)).as("c"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n_rep") || col("c") =!= col("n_rep"))
    assert(bad.count() === 0L)
  }

  test("mixture weights equalize expected tokens per source") {
    val out = Curation.mixtureWeights(docs(), col("source"), col("n_tok"))
      .select("source", "n_docs", "n_tokens", "token_share", "mix_weight")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.length === 7)
    val tot = out.map(_._3).sum
    // shares sum to 1
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4)
    // weight * tokens == tot / n_sources for every source (rounded at 6dp)
    out.foreach { case (s, _, ntok, _, w) =>
      assert(math.abs(w * ntok - tot / 7.0) < tot * 1e-5, s"source $s")
    }
    // doc counts add back up to the corpus
    assert(out.map(_._2).sum === 200L)
  }

  test("training order is a contiguous bijection, seed-stable, partitioning-invariant") {
    def order(parts: Int, seed: String): Seq[(Long, Long)] =
      Curation.trainingOrder(docs().repartition(parts).select("doc_id"), col("doc_id"), seed)
        .select("doc_id", "train_rank").as[(Long, Long)].collect().sortBy(_._2).toSeq
    val o1 = order(1, "s")
    assert(o1.map(_._2) === (1L to 200L))
    assert(o1.map(_._1).toSet.size === 200)
    assert(o1 === order(8, "s"))
    // a different seed is a different permutation (200! chance otherwise)
    assert(o1.map(_._1) !== order(1, "other").map(_._1))
  }

  test("epoch interleave ranks every replica once and scatters epochs") {
    val expanded = Curation.epochExpand(docs(), col("doc_id"), col("source"), col("n_tok"))
    val out = Curation.epochInterleave(docs(), col("doc_id"), col("source"),
      col("n_tok"), seed = "s")
    val n = expanded.count()
    assert(out.count() === n)
    // same replica multiset, ranks contiguous 1..n
    assert(out.select(min("train_rank")).as[Long].head() === 1L)
    assert(out.select(max("train_rank")).as[Long].head() === n)
    assert(out.select(countDistinct("train_rank")).as[Long].head() === n)
    assert(out.select("doc_id", "rep_idx").as[(Long, Long)].collect().sorted.toSeq ===
      expanded.select("doc_id", "rep_idx").as[(Long, Long)].collect().sorted.toSeq)
    // replicas of one doc do NOT sit adjacent: for docs with >= 2 reps,
    // at least one has non-consecutive ranks (md5 scatter)
    val gaps = out.filter(col("n_rep") >= 2)
      .groupBy("doc_id").agg((max("train_rank") - min("train_rank")).as("spread"),
        count(lit(1)).as("c"))
      .filter(col("spread") > col("c"))
    assert(gaps.count() > 0L)
  }

  test("source overlap counts distinct shared texts per unordered source pair") {
    val d = Seq(
      (1L, "s1", "dup"), (2L, "s2", "dup"), (3L, "s3", "dup"),
      (4L, "s1", "only"), (5L, "s2", "x"), (6L, "s2", "dup"),
      (7L, "s1", "pair"), (8L, "s3", "pair"))
      .toDF("doc_id", "source", "text")
    val out = Curation.sourceOverlap(d, col("source"), col("text"))
      .select("source_a", "source_b", "shared_texts")
      .as[(String, String, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq(
      ("s1", "s2", 1L), ("s1", "s3", 2L), ("s2", "s3", 1L)))
  }

  test("priority sample: exactly k, partitioning-invariant, HT threshold semantics") {
    val docs = (0L until 500L).map(i => (i, (i * 37 % 900) + 10)).toDF("doc_id", "w")
    val a = Curation.prioritySample(docs.repartition(1), col("doc_id"), col("w"), k = 40)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val b = Curation.prioritySample(docs.repartition(9), col("doc_id"), col("w"), k = 40)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a === b, "sample must not depend on partitioning")
    assert(a.size === 40)
    // HT semantics: est = max(w, τ) ≥ w, strictly positive
    a.foreach { case (_, w, _, est) => assert(est >= w && est > 0) }
    // weight-proportional inclusion sanity: the sampled mean weight
    // exceeds the population mean (heavy docs are favored)
    val popMean = (0L until 500L).map(i => (i * 37 % 900) + 10).sum.toDouble / 500
    val sampMean = a.map(_._2).sum / a.size
    assert(sampMean > popMean, s"sample mean $sampMean vs population $popMean")
  }

  test("priority sample: population <= k keeps everything with est = true weight") {
    val docs = (0L until 7L).map(i => (i, i + 1)).toDF("doc_id", "w")
    val out = Curation.prioritySample(docs, col("doc_id"), col("w"), k = 50)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.size === 7)
    out.foreach { case (_, w, _, est) => assert(est === w, "tau must be 0 under-population") }
  }
}
