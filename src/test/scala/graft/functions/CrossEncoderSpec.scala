package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Shared JVM counters (local-mode executors are threads) so the spec
 * can observe the per-partition scorer lifecycle. */
object CeCounters {
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxBatchSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { loads.set(0); closes.set(0); maxBatchSeen.set(0) }
}

/** Instrumented loader — stands in for a real ONNX cross-encoder
 * session factory. */
final case class CountingCeLoader(seed: Long, batch: Int)
    extends CrossEncoderLoader {
  def load(): CrossEncoder = {
    CeCounters.loads.incrementAndGet()
    val inner = HashOverlapCrossEncoder(seed, batch)
    new CrossEncoder {
      val name = inner.name
      val maxBatch = inner.maxBatch
      def scoreBatch(pairs: Array[(Array[String], Array[String])]): Array[Long] = {
        CeCounters.maxBatchSeen.getAndAccumulate(pairs.length, math.max)
        inner.scoreBatch(pairs)
      }
      override def close(): Unit = { CeCounters.closes.incrementAndGet() }
    }
  }
}

class CrossEncoderSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i =>
        (i.toLong, s"alpha beta word${i % 7} word${i % 7} word${i % 7} word${i % 7} gamma tail$i"))
      .toDF("doc_id", "text")

  private def cands(qids: Seq[Long], perQ: Seq[Long]) =
    (for (q <- qids; d <- perQ) yield (q, d)).toDF("query_id", "doc_id")

  test("stand-in weight: md5-derived, in [1, 2^20], and equal to the SQL hex idiom") {
    val terms = Seq("alpha", "word3", "tail17", "ü-umlaut")
    terms.foreach { t =>
      val w = HashOverlapCrossEncoder.weightOf(7L, t)
      assert(w >= 1 && w <= HashOverlapCrossEncoder.WeightMod)
      // replicate the oracle's strpos/substr computation verbatim
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ce:7:$t".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      val viaHex = (1 to 8).map { k =>
        ("0123456789abcdef".indexOf(hex.charAt(k - 1)).toLong) *
          math.pow(16, 8 - k).toLong
      }.sum % HashOverlapCrossEncoder.WeightMod + 1
      assert(w === viaHex, s"term $t")
    }
  }

  test("score: sum of query-term weights x tf saturated at 3; empty query scores 0") {
    val m = HashOverlapCrossEncoder(seed = 7L)
    val q = Array("alpha", "word3")
    val d = Array("alpha", "word3", "word3", "word3", "word3", "word3", "other")
    val Array(s) = m.scoreBatch(Array((q, d)))
    val expect = HashOverlapCrossEncoder.weightOf(7L, "alpha") * 1 +
      HashOverlapCrossEncoder.weightOf(7L, "word3") * 3 // tf 5 saturates at 3
    assert(s === expect)
    // duplicate query terms count once; missing terms contribute 0
    val Array(s2) = m.scoreBatch(Array((Array("alpha", "alpha", "nope"), d)))
    assert(s2 === HashOverlapCrossEncoder.weightOf(7L, "alpha"))
    val Array(z) = m.scoreBatch(Array((Array.empty[String], d)))
    assert(z === 0L)
  }

  test("rerank keeps zero-overlap AND corpus-missing candidates, ranks on (ce_micro DESC, doc_id)") {
    val d = docs(6)
    val queries = Seq((100L, Seq("word1", "alpha"))).toDF("query_id", "terms")
    // candidate 5 has word5/tail5 — no overlap with the query beyond
    // alpha; candidate 999 doesn't exist in docs and must be KEPT with
    // ce_micro = 0 (the oracle's fused10 LEFT JOIN ceagg + coalesce(0))
    val fused = cands(Seq(100L), Seq(1L, 2L, 5L, 999L))
    val got = Retrieval.crossEncoderRerank(fused, queries, d, "doc_id", "text",
        HashOverlapCrossLoader(seed = 7L), k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._2).toSet === Set(1L, 2L, 5L, 999L),
      "rerank must keep every nominated candidate, corpus-missing included")
    // every doc contains alpha once; doc 1 additionally matches word1
    // 4x (saturated to 3); 999 has no text so it scores exactly 0
    val wAlpha = HashOverlapCrossEncoder.weightOf(7L, "alpha")
    val wWord1 = HashOverlapCrossEncoder.weightOf(7L, "word1")
    val byDoc = got.map(r => r._2 -> r._3).toMap
    assert(byDoc(1L) === wAlpha + 3 * wWord1)
    assert(byDoc(2L) === wAlpha)
    assert(byDoc(5L) === wAlpha)
    assert(byDoc(999L) === 0L)
    // ties (docs 2 and 5) break on doc_id; the missing doc ranks last
    val ranks = got.map(r => r._2 -> r._4).toMap
    assert(ranks(1L) === 1 && ranks(2L) === 2 && ranks(5L) === 3 &&
      ranks(999L) === 4)
  }

  test("scorer loads once per non-empty partition, batches respect maxBatch, closes every load") {
    CeCounters.reset()
    val d = docs(200).repartition(4)
    val queries = (0 until 10)
      .map(i => (i.toLong * 10, Seq("alpha", s"word${i % 7}")))
      .toDF("query_id", "terms")
    val fused = cands((0 until 10).map(_.toLong * 10), (0L until 20L))
    val out = Retrieval.crossEncoderRerank(fused, queries, d, "doc_id", "text",
      CountingCeLoader(seed = 7L, batch = 8), k = 20).collect()
    assert(out.length === 200)
    assert(CeCounters.loads.get() >= 1,
      "scorer must load on the executors")
    assert(CeCounters.maxBatchSeen.get() <= 8, "batch slices must respect maxBatch")
    assert(CeCounters.closes.get() === CeCounters.loads.get(),
      "every loaded scorer must be closed at task completion")
  }

  test("rerank output invariant to doc partitioning") {
    val queries = Seq((0L, Seq("alpha", "word2"))).toDF("query_id", "terms")
    val fused = cands(Seq(0L), (0L until 12L))
    def run(parts: Int) =
      Retrieval.crossEncoderRerank(fused, queries, docs(12).repartition(parts),
          "doc_id", "text", HashOverlapCrossLoader(seed = 7L), k = 12)
        .as[(Long, Long, Long, Int)].collect().toSet
    assert(run(1) === run(7))
  }
}
