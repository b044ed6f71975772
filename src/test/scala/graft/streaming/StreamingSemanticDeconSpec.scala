package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.functions.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSemanticDeconSpec extends SparkTestBase {
  import spark.implicits._

  private val cents = Seq(0 -> Seq(1f, 0f), 1 -> Seq(-1f, 0f))

  // bench: one vector per cell
  private def bench = Seq(
    (900L, Seq(1.0f, 0.05f)),
    (901L, Seq(-1.0f, -0.02f)))
    .toDF("vec_id", "embedding")

  // corpus: 20 clean + 3 leaked (near a bench vector in its cell)
  private def corpusRows: Seq[(Long, Seq[Float])] =
    (1 to 10).map(i => (i.toLong, Seq(0.3f + 0.01f * i, 1.0f))) ++
      (11 to 20).map(i => (i.toLong, Seq(-0.3f - 0.01f * i, 1.0f))) ++
      Seq((101L, Seq(0.95f, 0.06f)),
        (102L, Seq(-0.97f, -0.01f)),
        (103L, Seq(0.99f, 0.04f)))

  test("streamed keep-set equals the batch verdicts; replay collapses") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-semdecon").toString
    val guard = StreamingSemanticDecon.fitGuard(bench, "vec_id", "embedding",
      cents, threshold = 0.9)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSemanticDecon.attach(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      guard, s"$dir/out", s"$dir/ckpt")
    val (a, b) = corpusRows.splitAt(9)
    input.addData(a: _*); q.processAllAvailable()
    input.addData(b: _*); q.processAllAvailable()
    // at-least-once replay: same rows again → bit-identical appends
    input.addData(b: _*); q.processAllAvailable()
    q.stop()

    val served = spark.read.parquet(s"$dir/out")
      .groupBy("vec_id").agg(max("batch_id"))
      .select("vec_id").as[Long].collect().toSet

    // batch reference over the same data
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val flagged = Dedup.semanticDecontaminate(corpus, "vec_id", bench,
      "vec_id", "embedding", cents, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(flagged === Set(101L, 102L, 103L), "fixture sanity")
    assert(served === corpusRows.map(_._1).toSet -- flagged,
      "streamed keep-set must equal the batch verdicts")
    StreamingSemanticDecon.releaseGuard(guard)
  }

  test("per-batch flagged facts are bit-identical to the batch operator") {
    val guard = StreamingSemanticDecon.fitGuard(bench, "vec_id", "embedding",
      cents, threshold = 0.9, margin = 0.05)
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val streamedFacts = corpusRows.grouped(7).map { chunk =>
      StreamingSemanticDecon.flaggedIn(chunk.toDF("vec_id", "embedding"),
        "vec_id", "embedding", guard)
        .as[(Long, Long, Double)].collect().toSet
    }.reduce(_ ++ _)
    val batchFacts = Dedup.semanticDecontaminate(corpus, "vec_id", bench,
      "vec_id", "embedding", cents, threshold = 0.9, margin = 0.05)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamedFacts === batchFacts,
      "split-into-batches facts must equal the one-shot batch facts")
    StreamingSemanticDecon.releaseGuard(guard)
  }
}
