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
}
