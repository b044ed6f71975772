package graft.streaming

import graft.SparkTestBase
import graft.model.MessageFormatConfig
import graft.streaming.IngestPipeline.StatusUpdate
import org.apache.spark.sql.functions._

/**
 * S1 soak: drive the full ingest pipeline from Spark's built-in
 * `rate` source — a REAL unbounded streaming source with its own
 * offset tracking — rather than a MemoryStream the test feeds by
 * hand. This is the closest no-egress stand-in for the Kinesis
 * connector ([[graft.sources.KinesisSource]]): an unbounded sequence
 * of records arriving on the source's schedule, consumed across many
 * micro-batches, stopped mid-stream.
 *
 * What it proves that the MemoryStream e2e cannot:
 *  - the pipeline keeps up with a source that produces continuously
 *    (several self-triggered micro-batches, not test-injected ones);
 *  - committed batches are LOSSLESS and exactly-once into the fact
 *    sink: the rate source's `value` is a gapless sequence, so the
 *    production-count facts must form exactly the expected residue
 *    set of a contiguous prefix — any drop, dup, or reorder across
 *    batch boundaries breaks the assert;
 *  - stateful status suppression holds across self-triggered batches.
 */
class RateSourceSoakSpec extends SparkTestBase {
  import spark.implicits._

  test("rate-source soak: multi-batch unbounded ingest is lossless and exactly-once (S1)") {
    implicit val s = spark
    // rate row -> reference envelope: machine m{value%4}; m0 carries an
    // alternating STATUS message (d/u by (value/4)%2), m1..m3 carry
    // PRODUCTION_COUNT messages whose value IS the rate sequence number
    val envelopes = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).option("numPartitions", 2).load()
      .select(base64(to_json(struct(array(struct(
        concat(lit("soak/line/a/m"), col("value") % 4,
          when(col("value") % 4 === 0, lit("/status")).otherwise(lit("/pc"))).as("name"),
        lit("GOOD").as("quality"),
        concat(date_format(timestamp_seconds(lit(1614968170L) + col("value")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("+00:00")).as("timestamp"),
        when(col("value") % 4 === 0,
          when((col("value") / 4).cast("long") % 2 === 0, "d").otherwise("u"))
          .otherwise(col("value").cast("string")).as("value"))).as("messages")))
        .cast("binary")).as("payload"))

    val machineConfigs = (0 until 4)
      .map(i => (s"soak/line/a/m$i", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")

    val facts = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val merges = scala.collection.mutable.ArrayBuffer[StatusUpdate]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val query = IngestPipeline.runIngest(
      envelopes, "payload",
      loadConfigs = () => (Seq(MessageFormatConfig(id = "DEFAULT")), machineConfigs),
      appendFacts = df => {
        val rows = df.select(col("id"), col("value")).collect()
        facts.synchronized { facts ++= rows.map(r => (r.getString(0), r.getString(1))) }
        batches.incrementAndGet()
        ()
      },
      mergeStatuses = ds => { val m = ds.collect(); merges.synchronized { merges ++= m }; () })

    // soak until the source has fed several committed micro-batches
    val deadline = System.currentTimeMillis() + 90000
    while ((batches.get() < 3 || facts.synchronized(facts.size) < 150) &&
        System.currentTimeMillis() < deadline && query.isActive) {
      Thread.sleep(500)
    }
    query.stop()
    query.awaitTermination(30000)

    val pc = facts.synchronized {
      facts.filter(_._1.startsWith("PRODUCTION_COUNT_")).map(_._2.toLong).toVector
    }
    assert(batches.get() >= 3, s"expected >=3 self-triggered micro-batches, got ${batches.get()}")
    assert(pc.size >= 150, s"soak produced only ${pc.size} production facts")
    // exactly-once + lossless: values are the residues {v : v%4 != 0}
    // of a contiguous prefix 1..max of the rate sequence — no gap
    // (loss), no repeat (double-commit), nothing out of range
    assert(pc.distinct.size === pc.size, "duplicate fact for a rate value (double-processing)")
    val expected = (1L to pc.max).filter(_ % 4 != 0).toSet
    assert(pc.toSet === expected,
      s"missing=${(expected -- pc.toSet).take(5)} extra=${(pc.toSet -- expected).take(5)}")
    // the m0 status stream flips d<->u every message: merges must all be
    // m0, valid decoded statuses, strictly increasing transition times
    // (suppression never re-emits a held status within a batch fold)
    val m0 = merges.synchronized(merges.toVector)
    assert(m0.nonEmpty, "no status transitions merged during soak")
    assert(m0.forall(_.machineId == "soak/line/a/m0"))
    assert(m0.forall(u => Set("DOWN", "UP").contains(u.machineStatus)))
    assert(m0.map(_.machineStatusUpdatedTimestamp) ===
      m0.map(_.machineStatusUpdatedTimestamp).sorted, "transition times must be monotonic")
  }
}
