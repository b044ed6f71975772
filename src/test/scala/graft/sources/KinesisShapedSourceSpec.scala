package graft.sources

import graft.SparkTestBase
import graft.model.MessageFormatConfig
import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.StatusUpdate
import org.apache.spark.sql.functions._

/**
 * S1 via the REAL DataSource V2 streaming contract: the
 * kinesis-shaped `MicroBatchStream` (offset JSON round-trip, per-shard
 * batch planning, InternalRow readers, checkpoint restart) feeding
 * [[KinesisSource.toEnvelope]] and the full ingest pipeline —
 * exactly the wiring a production cluster would use with the
 * connector jar, minus the network.
 */
class KinesisShapedSourceSpec extends SparkTestBase {
  import spark.implicits._

  private var n = 0
  private def freshName(): String = { n += 1; s"ks-spec-$n-${System.nanoTime()}" }
  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("short name resolves via ServiceLoader; envelope schema matches the connector's") {
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 2)
    val df = spark.readStream.format("kinesis-shaped")
      .option("streamName", nm).load()
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ===
      Seq("data", "streamName", "partitionKey", "sequenceNumber",
        "approximateArrivalTimestamp"))
    val env = KinesisSource.toEnvelope(df)
    assert(env.schema.fieldNames.toSeq ===
      Seq("payload", "partitionKey", "sequenceNumber", "arrivalTs"))
  }

  test("micro-batches advance with the stream head; rows carry the full envelope") {
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 2)
    KinesisShapedSource.putRecords(nm,
      Seq("k1" -> bytes("a"), "k2" -> bytes("b"), "k1" -> bytes("c")),
      arrivalUs = 1700000000000000L)
    val q = KinesisSource.toEnvelope(
        spark.readStream.format("kinesis-shaped").option("streamName", nm).load())
      .writeStream.format("memory").queryName(s"env$n").outputMode("append").start()
    q.processAllAvailable()
    val first = spark.table(s"env$n")
      .select(col("payload"), col("partitionKey"), col("sequenceNumber"))
      .as[(String, String, String)].collect()
    assert(first.length === 3)
    // payload is the record data re-encoded base64 — decode one back
    val byPayload = first.map(r =>
      new String(java.util.Base64.getDecoder.decode(r._1), "UTF-8") -> r).toMap
    assert(byPayload.keySet === Set("a", "b", "c"))
    assert(byPayload("a")._2 === "k1")
    // same partition key ⇒ same shard ⇒ ordered sequence numbers
    val k1Seqs = first.filter(_._2 == "k1").map(_._3).sorted
    assert(k1Seqs.length === 2 && k1Seqs(0) < k1Seqs(1))
    assert(first.forall(_._3.startsWith("shardId-")))

    // a second put is a NEW batch: only the delta lands
    KinesisShapedSource.putRecords(nm, Seq("k3" -> bytes("d")),
      arrivalUs = 1700000001000000L)
    q.processAllAvailable()
    q.stop()
    assert(spark.table(s"env$n").count() === 4)
  }

  test("checkpoint restart resumes from committed offsets (deserializeOffset path)") {
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 1)
    val ckpt = java.nio.file.Files.createTempDirectory("ks-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def start() = spark.readStream.format("kinesis-shaped")
      .option("streamName", nm).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select(col("data")).collect()
          .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8"))
        seen.synchronized { seen ++= rows }
        ()
      }.start()

    KinesisShapedSource.putRecords(nm, Seq("k" -> bytes("r1"), "k" -> bytes("r2")),
      arrivalUs = 1L)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(seen.sorted.toSeq === Seq("r1", "r2"))

    // records arriving while the query is DOWN are picked up on
    // restart — from the checkpointed offset, not from TRIM_HORIZON
    KinesisShapedSource.putRecords(nm, Seq("k" -> bytes("r3")), arrivalUs = 2L)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(seen.sorted.toSeq === Seq("r1", "r2", "r3"),
      "restart must not replay committed records nor miss down-time arrivals")
  }

  test("LATEST starting position skips pre-start history; TRIM_HORIZON reads it") {
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 1)
    KinesisShapedSource.putRecords(nm, Seq("k" -> bytes("old")), arrivalUs = 1L)
    def run(pos: String, tbl: String): Long = {
      val q = spark.readStream.format("kinesis-shaped")
        .option("streamName", nm).option("startingPosition", pos).load()
        .writeStream.format("memory").queryName(tbl).outputMode("append").start()
      q.processAllAvailable()
      KinesisShapedSource.putRecords(nm, Seq("k" -> bytes(s"new-$pos")), arrivalUs = 2L)
      q.processAllAvailable(); q.stop()
      spark.table(tbl).count()
    }
    assert(run("TRIM_HORIZON", s"th$n") >= 2L)
    val nm2 = freshName()
    KinesisShapedSource.createStream(nm2, 1)
    KinesisShapedSource.putRecords(nm2, Seq("k" -> bytes("old")), arrivalUs = 1L)
    val q = spark.readStream.format("kinesis-shaped")
      .option("streamName", nm2).option("startingPosition", "LATEST").load()
      .writeStream.format("memory").queryName(s"lt$n").outputMode("append").start()
    q.processAllAvailable()
    KinesisShapedSource.putRecords(nm2, Seq("k" -> bytes("fresh")), arrivalUs = 2L)
    q.processAllAvailable(); q.stop()
    val got = spark.table(s"lt$n").select(col("data")).collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    assert(got === Set("fresh"), "LATEST must skip pre-start records")
  }

  test("misconfiguration fails loud: missing streamName, unknown stream, bad position") {
    intercept[Exception] {
      spark.readStream.format("kinesis-shaped").load()
        .writeStream.format("noop").start().processAllAvailable()
    }
    intercept[Exception] {
      val q = spark.readStream.format("kinesis-shaped")
        .option("streamName", "never-created").load()
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    intercept[Exception] {
      spark.readStream.format("kinesis-shaped")
        .option("streamName", "x").option("startingPosition", "AT_TIMESTAMP")
        .load()
        .writeStream.format("noop").start().processAllAvailable()
    }
  }

  test("harness misuse fails loud: offset past Int index space, end behind committed start") {
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 1)
    KinesisShapedSource.putRecords(nm, Seq(("k", bytes("a"))), arrivalUs = 0L)
    // slice guards the registry's Int index space instead of wrapping
    intercept[IllegalArgumentException] {
      KinesisShapedSource.slice(nm, 0, 0L, Int.MaxValue.toLong + 1)
    }
    intercept[IllegalArgumentException] {
      KinesisShapedSource.slice(nm, 0, -1L, 1L)
    }
    // a createStream reset under a live checkpoint makes latestOffset
    // fall BEHIND the committed start — planInputPartitions must refuse
    // rather than silently plan an empty batch
    val mbs = new KinesisShapedMicroBatchStream(nm, "TRIM_HORIZON")
    intercept[IllegalArgumentException] {
      mbs.planInputPartitions(ShardOffsets(Array(5L)), ShardOffsets(Array(1L)))
    }
    // equal offsets stay a legitimate empty batch
    assert(mbs.planInputPartitions(
      ShardOffsets(Array(1L)), ShardOffsets(Array(1L))).isEmpty)
  }

  test("IngestPipeline end-to-end through the DSv2 source (S1 wiring, full parse + sinks)") {
    implicit val s = spark
    val nm = freshName()
    KinesisShapedSource.createStream(nm, 2)
    val goodTs = "2021-03-05 18:16:10.517000+00:00"
    def kinesisData(tag: String, value: String): Array[Byte] =
      bytes(s"""{"messages":[{"name":"site/area/line/m1/$tag","quality":"GOOD","timestamp":"$goodTs","value":"$value"}]}""")
    val machineConfigs = Seq(("site/area/line/m1", "status", "pc", "u", "d", "i"))
      .toDF("machineId", "statusTag", "productionCountTag",
        "statusUpValues", "statusDownValues", "statusIdleValues")

    val facts = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val merges = scala.collection.mutable.ArrayBuffer[StatusUpdate]()
    val envelopes = KinesisSource.toEnvelope(
      spark.readStream.format("kinesis-shaped").option("streamName", nm).load())
    val query = IngestPipeline.runIngest(
      envelopes, "payload",
      loadConfigs = () => (Seq(MessageFormatConfig(id = "DEFAULT")), machineConfigs),
      appendFacts = df => facts.synchronized { facts ++= df.collect() },
      mergeStatuses = ds => merges.synchronized { merges ++= ds.collect() })

    KinesisShapedSource.putRecords(nm, Seq(
      "site/area/line/m1" -> kinesisData("status", "d"),
      "site/area/line/m1" -> kinesisData("pc", "42"),
      "site/area/line/m1" -> kinesisData("temperature", "99")),
      arrivalUs = 1614968170517000L)
    query.processAllAvailable()
    query.stop()

    // same contract the MemoryStream-driven e2e pins: temperature
    // dropped (P5), status + pc become facts, one folded status merge
    assert(facts.map(_.getString(0)).toSet ===
      Set("STATUS_site/area/line/m1", "PRODUCTION_COUNT_site/area/line/m1"))
    assert(merges.toSeq === Seq(StatusUpdate("site/area/line/m1", "DOWN", 1614968170L)))
  }
}
