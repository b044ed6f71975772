package graft.streaming

import graft.SparkTestBase
import graft.query.Kpi
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingOeeSpec extends SparkTestBase {
  import spark.implicits._

  // the KpiSpec OEE fixture (two lines, rollover on m2) plus a
  // machine with tie transitions and a third line
  private val events: Seq[(String, Long, String, Long)] = Seq(
    ("s0/a0/line0/m1", 0L, "UP", 0L), ("s0/a0/line0/m1", 60L, "DOWN", 10L),
    ("s0/a0/line0/m1", 120L, "UP", 20L), ("s0/a0/line0/m1", 180L, "UP", 30L),
    ("s0/a0/line1/m2", 0L, "UP", 0L), ("s0/a0/line1/m2", 60L, "IDLE", 10L),
    ("s0/a0/line1/m2", 120L, "UP", 3L), ("s0/a0/line1/m2", 180L, "UP", 8L),
    ("s0/a0/line2/m3", 0L, "DOWN", 5L), ("s0/a0/line2/m3", 0L, "UP", 5L),
    ("s0/a0/line2/m3", 90L, "DOWN", 7L))

  private def decorate(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ts_us", col("es") * 1000000L)
      .withColumn("quality", when(col("cnt") % 3L === 0L, "GOOD").otherwise("BAD"))

  private def telemetryDf(rows: Seq[(String, Long, String, Long)]) =
    decorate(rows.toDF("machineId", "es", "status", "cnt"))

  private def runStream(batches: Seq[Seq[(String, Long, String, Long)]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val query = StreamingOee.accountingStream(
        decorate(input.toDF().toDF("machineId", "es", "status", "cnt")))
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    // the freshest (max as_of) row per machine is the store's current row
    spark.table(name)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("machineId")
          .orderBy(col("as_of").desc, col("_n").desc)))
      .filter(col("_rn") === 1).drop("_rn")
  }

  test("streamed per-machine accounting equals the batch windows on the same prefix") {
    val batchAcc = Kpi.oeeMachineAccounting(telemetryDf(events))
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    val store = runStream(events.grouped(4).toSeq, "oee_a")
      .select("machineId", "_down", "_tot", "_prod", "_good", "_n")
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    assert(store === batchAcc)
  }

  test("line OEE read off the streamed store is bit-identical to batch Kpi.oee") {
    val expected = Kpi.oee(telemetryDf(events))
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    // a different batch split must converge to the same store
    val store = runStream(Seq(events.filter(_._2 < 100), events.filter(_._2 >= 100)), "oee_b")
    val streamed = StreamingOee.lineOee(store)
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("stop/restart from the checkpoint continues the accounting exactly") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-oee-ckpt").toString
    val storeDir = java.nio.file.Files.createTempDirectory("graft-oee-store").toString
    val input = MemoryStream[(String, Long, String, Long)]
    // the memory sink cannot recover from a checkpoint — use the
    // foreachBatch upsert shape (what a real deployment does)
    def start() = StreamingOee.accountingStream(
        decorate(input.toDF().toDF("machineId", "es", "status", "cnt")))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOee.OeeMachine], _: Long) =>
        b.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(storeDir): Unit
      }.start()
    val (firstHalf, secondHalf) = events.splitAt(6)
    val q1 = start()
    input.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    // a new query from the SAME checkpoint resumes state, not restarts
    val q2 = start()
    input.addData(secondHalf: _*); q2.processAllAvailable(); q2.stop()
    val store = spark.read.parquet(storeDir)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("machineId")
          .orderBy(col("as_of").desc, col("_n").desc)))
      .filter(col("_rn") === 1)
      .select("machineId", "_down", "_tot", "_prod", "_good", "_n")
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    val batchAcc = Kpi.oeeMachineAccounting(telemetryDf(events))
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    assert(store === batchAcc)
  }

  test("cross-batch late message is dropped by the production fold, not banked as a rollover") {
    import StreamingOee._
    val st = new TestGroupState[OeeState]
    // batch 1: in-order counter 0 → 10 → 20 (qualities follow
    // decorate's cnt%3 rule so the batch-parity check below lines up)
    foldOee("m", Iterator(
      OeeObs("m", 0L, "UP", 0L, "GOOD"), OeeObs("m", 60L, "UP", 10L, "BAD"),
      OeeObs("m", 120L, "UP", 20L, "BAD")), st).toSeq
    // batch 2: a LATE message (ts 90, cnt 15) arrives after the fold
    // horizon advanced to (120, 20). Before the horizon fix this
    // looked like a rollover: banked += 20 and lastCnt regressed to
    // 15 — permanently inflating _prod to 20 + 25 = 45.
    val out2 = foldOee("m", Iterator(
      OeeObs("m", 90L, "UP", 15L, "GOOD"), OeeObs("m", 180L, "UP", 25L, "BAD")), st).toSeq
    assert(out2.head._prod === 25L, "late message must not bank a phantom rollover")
    assert(out2.head._n === 4L, "dropped message must not count toward totals")
    assert(out2.head._good === 1L)
    // parity: the store equals the batch accounting over the ACCEPTED
    // (in-order) subsequence — exactly what a batch recompute over the
    // retention-filtered, ordered prefix would produce
    val accepted = Seq(
      ("m", 0L, "UP", 0L), ("m", 60L, "UP", 10L),
      ("m", 120L, "UP", 20L), ("m", 180L, "UP", 25L))
    val batchAcc = Kpi.oeeMachineAccounting(telemetryDf(accepted))
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    val streamed = out2.map(o =>
      (o.machineId, o._down, o._tot, o._prod, o._good, o._n)).toSet
    assert(streamed === batchAcc)
  }

  test("cross-batch same-second status pair folds like the batch (ts, status) order") {
    import StreamingOee._
    // batch 1 delivers (0, UP); batch 2 late-delivers (0, DOWN), which
    // sorts BEFORE the accepted (0, UP) in the batch (ts, status)
    // order. Before the (ts, status)-keyed staleness rule the status
    // fold accepted it in ARRIVAL order and flipped the open segment
    // to DOWN — so the later DOWN at 90 closed nothing and the UP at
    // 150 closed a phantom 150 s DOWN segment (down=150 instead of 60).
    val st = new TestGroupState[OeeState]
    foldOee("m", Iterator(OeeObs("m", 0L, "UP", 5L, "BAD")), st).toSeq
    // stale to BOTH folds: status DOWN < open UP at the same second,
    // cnt 3 < 5 at the same second for the production horizon
    foldOee("m", Iterator(OeeObs("m", 0L, "DOWN", 3L, "GOOD")), st).toSeq
    val out = foldOee("m", Iterator(
      OeeObs("m", 90L, "DOWN", 7L, "BAD"), OeeObs("m", 150L, "UP", 8L, "BAD")), st).toSeq
    assert(out.head._down === 60.0, "late same-second flip must not reopen as DOWN")
    assert(out.head._tot === 150.0)
    // and the accepted subsequence parity holds against the batch fold
    val accepted = Seq(("m", 0L, "UP", 5L), ("m", 90L, "DOWN", 7L), ("m", 150L, "UP", 8L))
    val batchAcc = Kpi.oeeMachineAccounting(telemetryDf(accepted))
      .as[(String, Double, Double, Long, Long, Long)].collect().toSet
    assert(out.map(o => (o.machineId, o._down, o._tot, o._prod, o._good, o._n)).toSet
      === batchAcc)
  }

  test("pure fold: tie transition closes a zero-length segment; rollover banks") {
    import StreamingOee._
    val st = new TestGroupState[OeeState]
    val out = foldOee("m", Iterator(
      OeeObs("m", 0L, "DOWN", 5L, "GOOD"), OeeObs("m", 0L, "UP", 5L, "GOOD"),
      OeeObs("m", 90L, "DOWN", 2L, "BAD")), st).toSeq
    // DOWN [0,0) closed (0s), UP [0,90) closed (90s); cnt 5,5,2 banks 5
    assert(out === Seq(OeeMachine("m", 0.0, 90.0, 5L + 2L, 2L, 3L, 90L)))
  }
}
