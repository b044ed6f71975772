package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingLivenessSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 1609500000L
  private val Ttl = 100L

  private def run(batches: Seq[Seq[(String, Long)]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val query = StreamingLiveness.alertStream(
        input.toDF().toDF("machineId", "es")
          .select(col("machineId"), timestamp_seconds(col("es")).as("ts")),
        ttlSeconds = Ttl)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name)
      .select("machineId", "kind", "last_seen", "as_of")
      .as[(String, String, Long, Long)].collect().toSeq
  }

  test("watermark-driven STALE alert at expiry, RECOVERED on revival; live machines silent") {
    val alerts = run(Seq(
      Seq(("A", t0), ("B", t0)),           // both alive, timeouts armed at t0+100
      Seq(("B", t0 + 300)),                // watermark -> t0; A not yet expired
      Seq(("B", t0 + 310)),                // watermark -> t0+300 > t0+100: A STALE
      Seq(("A", t0 + 400)),                // A returns: RECOVERED
      Seq(("B", t0 + 420))), "lv_a")
    assert(alerts.count(_._1 == "B") === 0, s"B must stay silent: $alerts")
    val a = alerts.filter(_._1 == "A")
    assert(a === Seq(
      ("A", "STALE", t0, t0 + Ttl),
      ("A", "RECOVERED", t0 + 400, t0 + 400)), s"got $alerts")
  }

  test("continued silence never re-alerts: exactly one STALE until revival") {
    val alerts = run(Seq(
      Seq(("L", t0), ("B", t0)),
      Seq(("B", t0 + 200)), Seq(("B", t0 + 400)),  // L expires here...
      Seq(("B", t0 + 600)), Seq(("B", t0 + 800)),  // ...and stays silent
      Seq(("B", t0 + 1000))), "lv_b")
    assert(alerts.count(r => r._1 == "L" && r._2 == "STALE") === 1, s"got $alerts")
    assert(!alerts.exists(_._2 == "RECOVERED"), s"got $alerts")
    assert(alerts.count(_._1 == "B") === 0)
  }

  test("restart from the checkpoint keeps armed timeouts and pending staleness") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lv-ckpt").toString
    val store = java.nio.file.Files.createTempDirectory("graft-lv-store").toString
    val input = MemoryStream[(String, Long)]
    def start() = StreamingLiveness.alertStream(
        input.toDF().toDF("machineId", "es")
          .select(col("machineId"), timestamp_seconds(col("es")).as("ts")),
        ttlSeconds = Ttl)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingLiveness.LivenessAlert], _: Long) =>
        b.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store): Unit
      }.start()
    val q1 = start()
    input.addData(("A", t0), ("B", t0)); q1.processAllAvailable()
    input.addData(("B", t0 + 300)); q1.processAllAvailable()
    q1.stop() // A's timeout is armed but not yet fired
    val q2 = start()
    input.addData(("B", t0 + 310)); q2.processAllAvailable() // watermark passes A's expiry
    input.addData(("A", t0 + 400)); q2.processAllAvailable()
    q2.stop()
    val alerts = spark.read.parquet(store)
      .select("machineId", "kind", "last_seen", "as_of")
      .as[(String, String, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(alerts.filter(_._1 == "A") === Seq(
      ("A", "STALE", t0, t0 + Ttl), ("A", "RECOVERED", t0 + 400, t0 + 400)),
      s"got $alerts")
    assert(alerts.count(_._1 == "B") === 0)
  }

  test("pure fold: timeout emits STALE once, revival emits RECOVERED") {
    import StreamingLiveness._
    val st = new TestGroupState[LiveState]
    st.update(LiveState(t0, stale = false))
    st.setTimedOut(true)
    val out = foldLiveness(Ttl)("A", Iterator.empty, st).toSeq
    assert(out === Seq(LivenessAlert("A", "STALE", t0, t0 + Ttl)))
    assert(st.get === LiveState(t0, stale = true))
    st.setTimedOut(false)
    val out2 = foldLiveness(Ttl)("A", Iterator(Reading("A", new java.sql.Timestamp((t0 + 500) * 1000L))), st).toSeq
    assert(out2 === Seq(LivenessAlert("A", "RECOVERED", t0 + 500, t0 + 500)))
    assert(st.get === LiveState(t0 + 500, stale = false))
  }
}
