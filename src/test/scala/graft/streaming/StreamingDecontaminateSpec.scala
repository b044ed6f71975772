package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.functions.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val evalRows = Seq(
    (900L, "held out benchmark question about spark shuffles and joins today"),
    (901L, "another benchmark item on window functions and watermarks here"))

  private def evalDf = evalRows.toDF("doc_id", "text")

  // 3 contaminated docs (eval text verbatim inside), the rest clean
  private def trainRows: Seq[(Long, String)] =
    (1 to 40).map(i => (i.toLong, s"clean training document $i with body ${"w" * (i % 9)}")) ++
      Seq((101L, "prefix " + evalRows(0)._2 + " suffix"),
        (102L, evalRows(1)._2),
        (103L, "x " + evalRows(1)._2 + " y"))

  test("streamed keeps equal the batch decontamination verdicts; replay collapses") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-decon").toString
    val guard = StreamingDecontaminate.fitGuard(evalDf, "doc_id", "text",
      n = 5, minContainment = 0.5)

    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontaminate.attach(
      input.toDF().toDF("doc_id", "text"), guard, s"$dir/out", s"$dir/ckpt")
    val (a, b) = trainRows.splitAt(17)
    input.addData(a: _*); q.processAllAvailable()
    input.addData(b: _*); q.processAllAvailable()
    // at-least-once replay: same rows again → bit-identical appends
    input.addData(b: _*); q.processAllAvailable()
    q.stop()

    val served = spark.read.parquet(s"$dir/out")
      .groupBy("doc_id").agg(max("batch_id"))
      .select("doc_id").as[Long].collect().toSet

    // batch reference: anti-join on contaminationPairs over the same data
    val train = trainRows.toDF("doc_id", "text")
    val contaminated = Dedup.contaminationPairs(train, evalDf, "doc_id", "text",
      n = 5, minContainment = 0.5).select("train_id").as[Long].collect().toSet
    assert(contaminated === Set(101L, 102L, 103L), "fixture sanity")
    val expected = trainRows.map(_._1).toSet -- contaminated
    assert(served === expected, "streamed keep-set must equal the batch verdicts")
  }

  test("bloom prefilter: every contaminated doc is sketch-positive; clean docs mostly pruned") {
    val guard = StreamingDecontaminate.fitGuard(evalDf, "doc_id", "text", n = 5)
    val batch = trainRows.toDF("doc_id", "text")
    val kept = StreamingDecontaminate.processBatch(batch, guard)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === trainRows.map(_._1).toSet -- Set(101L, 102L, 103L))
    // the prefilter's classification, probed directly: no false
    // negatives ever; false-positive clean docs are a small minority
    // (they only cost a redundant exact check)
    val hits = Dedup.shingleSets(batch, "doc_id", "text", 5)
      .select(col("doc_id"),
        exists(col("sh_set"), s => Dedup.bloomMightContain(guard.bloom, s)).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    assert(Seq(101L, 102L, 103L).forall(hits(_)), "contaminated docs must be sketch-positive")
    val cleanHits = hits.count { case (id, h) => h && id < 100L }
    assert(cleanHits <= 4, s"bloom should prune most clean docs, $cleanHits hit")
  }
}
