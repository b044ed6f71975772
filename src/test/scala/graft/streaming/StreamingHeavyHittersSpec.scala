package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._
  private implicit val sp: org.apache.spark.sql.SparkSession = spark

  private val M = 64
  // hot items with strong mass + a churning tail of one-off keys
  private val stream: Seq[String] =
    (1 to 8).flatMap(k => Seq.fill(1200 / k)(s"hot$k")) ++
      (0 until 4000).map(i => s"tail$i")

  private def trueCounts = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def appendBatch(dir: String, batch: Seq[String], id: Long): Unit =
    StreamingHeavyHitters.batchSummary(batch.toDF("v"), "v", M, id)
      .write.mode(SaveMode.Append).parquet(dir)

  private def cands(dir: String): Map[String, Long] =
    StreamingHeavyHitters.candidates(dir).as[(String, Long)].collect().toMap

  test("merged summaries: superset of true heavy hitters, counts lower-bounded within n/(m+1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shh").toString + "/store"
    val batches = stream.grouped(2000).toSeq
    batches.zipWithIndex.foreach { case (b, i) => appendBatch(dir, b, i.toLong) }
    val got = cands(dir)
    val n = stream.size.toLong
    val errBound = n / (M + 1) + batches.size // one rounding slack per batch merge
    // every phi-heavy item (phi = 1/M) must be present with a sound count
    trueCounts.filter(_._2 >= n / M).foreach { case (k, t) =>
      assert(got.contains(k), s"heavy item $k missing")
      assert(got(k) <= t, s"$k stored ${got(k)} exceeds true $t")
      assert(got(k) >= t - errBound, s"$k stored ${got(k)} below bound ${t - errBound}")
    }
    // replay: a re-appended batch summary collapses by fact identity
    appendBatch(dir, batches.head, 0L)
    assert(cands(dir) === got, "replay must not change the summary")
  }

  test("compaction + trim bounds the base at m keys and keeps heavy items sound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shh-trim").toString + "/store"
    val batches = stream.grouped(1500).toSeq
    batches.zipWithIndex.foreach { case (b, i) => appendBatch(dir, b, i.toLong) }
    val before = cands(dir)
    SketchCompaction.compact(dir, Nil, Seq("v"))
    assert(cands(dir) === before, "compaction alone is read-invisible")
    StreamingHeavyHitters.trimBase(dir, M)
    val baseRows = spark.read.parquet(s"$dir.base/bins").count()
    assert(baseRows <= M, s"trimmed base must hold <= $M keys, got $baseRows")
    val after = cands(dir)
    val n = stream.size.toLong
    // the trim widens the undercount by the cut value but heavy items
    // survive with still-sound (lower-bound) counts
    trueCounts.filter(_._2 >= n / 16).foreach { case (k, t) =>
      assert(after.contains(k), s"very heavy item $k must survive the trim")
      assert(after(k) <= t)
    }
  }

  test("e2e: attach(compactEvery) maintains a bounded live candidate store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shh-e2e").toString
    val input = MemoryStream[String]
    val query = StreamingHeavyHitters.attach(
      input.toDF().toDF("v"), "v", M, s"$dir/store", s"$dir/ckpt", compactEvery = 2)
    stream.grouped(1200).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    val got = cands(s"$dir/store")
    val n = stream.size.toLong
    trueCounts.filter(_._2 >= n / 16).foreach { case (k, t) =>
      assert(got.contains(k) && got(k) <= t, s"$k: ${got.get(k)} vs true $t")
    }
  }
}
