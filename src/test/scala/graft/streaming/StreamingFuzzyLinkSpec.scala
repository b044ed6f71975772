package graft.streaming

import graft.SparkTestBase
import graft.functions.FuzzyJoin
import org.apache.spark.sql.functions._

class StreamingFuzzyLinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fuzzylink").toString

  private val batch1 = Seq("abcd", "wxyz", "Cust#0001")
  private val batch2 = Seq("abce", "Cust#0002") // links to abcd, Cust#0001
  private val batch3 = Seq("abcd", "qqqq")      // re-arrival + singleton

  private def run(store: String, batches: Seq[(Seq[String], Long)]) =
    batches.map { case (b, id) =>
      val out = StreamingFuzzyLink.processBatch(
        spark, b.toDF("s"), "s", store, id)
      val set = out.as[(String, String)].collect().toSet
      out.unpersist()
      set
    }

  test("union of emitted pairs over the stream equals the batch operator (parity)") {
    val store = tmp()
    val emitted = run(store,
      Seq(batch1 -> 0L, batch2 -> 1L, batch3 -> 2L)).reduce(_ ++ _)
    val all = (batch1 ++ batch2 ++ batch3).toDF("s")
    val expect = FuzzyJoin.editDistance1Pairs(all, "s")
      .as[(String, String)].collect().toSet
    assert(emitted === expect)
    assert(expect.contains(("abcd", "abce")))
    assert(expect.contains(("Cust#0001", "Cust#0002")))
  }

  test("cross-batch pair is emitted by the batch that completes it") {
    val store = tmp()
    val Seq(e1, e2, _) = run(store,
      Seq(batch1 -> 0L, batch2 -> 1L, batch3 -> 2L))
    assert(e1 === Set.empty)
    assert(e2 === Set(("abcd", "abce"), ("Cust#0001", "Cust#0002")))
  }

  test("within-batch pairs link without standing state") {
    val store = tmp()
    val Seq(e) = run(store, Seq(Seq("abcd", "abce", "zzzz") -> 0L))
    assert(e === Set(("abcd", "abce")))
  }

  test("replayed batch recomputes the identical pair set (at-least-once safety)") {
    val store = tmp()
    val Seq(_, first) = run(store, Seq(batch1 -> 0L, batch2 -> 1L))
    // crash-replay of batch 1: same data, same id, store already has
    // the first attempt's stamped append
    val Seq(replay) = run(store, Seq(batch2 -> 1L))
    assert(replay === first)
  }

  test("compaction preserves linkage behavior") {
    val store = tmp()
    run(store, Seq(batch1 -> 0L, batch2 -> 1L))
    StreamingFuzzyLink.compactStore(spark, store)
    // a third batch must still see the standing keys post-compaction
    val Seq(e3) = run(store, Seq(Seq("abcf") -> 2L))
    assert(e3 === Set(("abcd", "abcf"), ("abce", "abcf")))
  }

  test("re-arrival re-emits standing pairs; distinct set is stable") {
    val store = tmp()
    val Seq(_, _, e3) = run(store,
      Seq(batch1 -> 0L, batch2 -> 1L, batch3 -> 2L))
    // batch3 re-delivers abcd → its standing link re-emits
    assert(e3 === Set(("abcd", "abce")))
  }
}
