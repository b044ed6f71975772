package graft.streaming

import graft.SparkTestBase
import graft.functions.Kmv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingKmvSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Seq[(String, Long)] =
    (0 until 4000).map(i => (s"g${i % 2}", (i * 7919L) % 1300L))

  private def flatSketch = Kmv.sketch(
      rows.toDF("g", "v"), Seq("g"), col("v").cast("string"), 128)
    .as[(String, Long)].collect().toSet

  test("streamed store equals the flat sketch on any split; replay/out-of-order invariant") {
    for (nSplits <- Seq(1, 5)) {
      val batches = rows.grouped(math.max(1, rows.size / nSplits)).toSeq
      var store: Option[org.apache.spark.sql.DataFrame] = None
      batches.foreach { b =>
        store = Some(StreamingKmv.mergeBatch(store, b.toDF("g", "v"),
          Seq("g"), "v", 128).localCheckpoint(true))
      }
      val streamed = store.get.as[(String, Long)].collect().toSet
      assert(streamed === flatSketch, s"splits=$nSplits")
      // replay the first batch again, out of order: nothing moves
      val replayed = StreamingKmv.mergeBatch(store, batches.head.toDF("g", "v"),
        Seq("g"), "v", 128).as[(String, Long)].collect().toSet
      assert(replayed === flatSketch, s"splits=$nSplits replay")
    }
  }

  test("e2e store over micro-batches; set algebra reads off the stored sketches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-stream").toString
    val input = MemoryStream[(String, Long)]
    val query = StreamingKmv.attach(
      input.toDF().toDF("g", "v"), Seq("g"), "v", 128, s"$dir/store", s"$dir/ckpt")
    rows.grouped(1500).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    val store = spark.read.parquet(s"$dir/store")
    assert(store.as[(String, Long)].collect().toSet === flatSketch)
    // union estimate across the two stored group sketches ≈ 1300 true
    val u = Kmv.estimate(Kmv.merge(store, Seq.empty, 128), Seq.empty, 128)
      .select("estimate").as[Double].head()
    assert(math.abs(u - 1300.0) / 1300.0 < 0.4, s"union est $u")
    // direct θ-intersection off the SAME stored sketches — the o15
    // estimator composes with the streaming store because a stored
    // sketch is bit-identical to the flat one (proven above), so the
    // store-served intersection must equal the flat-data answer
    // exactly, not approximately
    val storeInter = Kmv.intersectEstimate(
        store.select(col("g"), col("h")), "g", 128)
      .as[(String, String, Long, Double)].collect().toSet
    val flatInter = Kmv.intersectEstimate(
        Kmv.sketch(rows.toDF("g", "v"), Seq("g"), col("v").cast("string"), 128),
        "g", 128)
      .as[(String, String, Long, Double)].collect().toSet
    assert(storeInter === flatInter, "store-served θ-intersection == flat")
    // the fixture's groups are DISJOINT (even i → even residues, odd
    // i → odd residues under ·7919 mod 1300): the direct estimator
    // says exactly 0, where inclusion-exclusion over the same
    // sketches (est_A + est_B − est_U ≈ 650 + 650 − 1443) would go
    // NEGATIVE — the o15 regime in one line
    val (_, _, nCommon, est) = storeInter.head
    assert(nCommon == 0L && est == 0.0, s"disjoint groups must estimate 0, got $est")
  }
}
