package graft.streaming

import graft.SparkTestBase
import graft.query.Kpi
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingRateAnomalySpec extends SparkTestBase {
  import spark.implicits._

  // one spiky machine (alternating 9/11 then +500, a rollover reset,
  // one normal), one steady machine (constant => zero variance), one
  // noisy machine that produces sub-threshold scores only
  private def cum(deltas: Seq[Long]): Seq[Long] = deltas.scanLeft(0L)(_ + _).tail
  private val sDeltas = (0 until 20).map(i => if (i % 2 == 0) 9L else 11L) ++ Seq(500L)
  private val events: Seq[(String, Long, Long)] =
    (cum(sDeltas) ++ Seq(5L, 15L)).zipWithIndex.map { case (c, i) => ("S", i.toLong, c) } ++
      (0 until 30).map(i => ("C", i.toLong, 10L * i)) ++
      (0 until 40).map(i => ("N", i.toLong, 10L * i + (i % 5)))

  private val W = 16; private val MinObs = 8; private val Z = 3.0

  private def batchAnomalies(prefix: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Double)] = {
    val telemetry = prefix.toDF("machineId", "es", "cnt")
      .withColumn("ts_us", col("es") * 1000000L)
      .withColumn("event_id", col("es"))
    Kpi.rateAnomaly(telemetry, W, MinObs, Z)
      .select("machineId", "event_id", "delta", "n_window", "z_score")
      .as[(String, Long, Long, Long, Double)].collect().toSet
  }

  private def runStream(batches: Seq[Seq[(String, Long, Long)]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val query = StreamingRateAnomaly.anomalyStream(
        input.toDF().toDF("machineId", "es", "cnt")
          .select(col("machineId"), (col("es") * 1000000L).as("tsUs"),
            col("es").as("eventId"), col("cnt")),
        W, MinObs, Z)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name)
      .select("machineId", "event_id", "delta", "n_window", "z_score")
      .as[(String, Long, Long, Long, Double)].collect().toSet
  }

  test("streamed anomalies equal the batch detector on the same prefix (split invariance)") {
    val expected = batchAnomalies(events)
    assert(expected.nonEmpty && expected.map(_._1) === Set("S"))
    // interleave machines into size-based and per-machine batch splits
    val bySize = events.grouped(7).toSeq
    val byMachine = Seq(events.filter(_._1 == "S"),
      events.filter(_._1 == "C"), events.filter(_._1 == "N"))
    assert(runStream(bySize, "ra_a") === expected)
    assert(runStream(byMachine, "ra_b") === expected)
  }

  test("pure fold: ring caps at windowRows, rollover skips, stale drops") {
    import StreamingRateAnomaly._
    val st = new TestGroupState[RateState]
    val obs = (0 until 30).map(i => RateObs("A", i.toLong, i.toLong, 10L * i))
    assert(foldRate(8, 4, 3.0)("A", obs.iterator, st).isEmpty) // constant: var 0
    assert(st.get.deltas.size === 8) // capped
    // rollover: negative delta never enters the ring, baseline moves
    val out2 = foldRate(8, 4, 3.0)("A",
      Iterator(RateObs("A", 30L, 30L, 5L), RateObs("A", 31L, 31L, 15L)), st).toSeq
    assert(out2.isEmpty)
    assert(st.get.deltas === Vector(10L, 10L, 10L, 10L, 10L, 10L, 10L, 10L))
    assert(st.get.lastCnt === 15L)
    // stale message (ts before last) is ignored entirely
    val before = st.get
    assert(foldRate(8, 4, 3.0)("A",
      Iterator(RateObs("A", 2L, 99L, 1000000L)), st).isEmpty)
    assert(st.get === before.copy())
  }
}
