package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * A REAL DataSource V2 `MicroBatchStream` serving the Kinesis
 * connector's record envelope — the S1 seam exercised through the
 * actual `org.apache.spark.sql.connector` streaming contract instead
 * of MemoryStream: offset JSON round-trips through the checkpoint
 * log, batches are planned per shard from (start, end] offset ranges,
 * readers produce `InternalRow`s, and a restarted query resumes from
 * `deserializeOffset` — everything the missing connector jar would do
 * against the service, minus the network.
 *
 * Record shape matches `spark-streaming-sql-kinesis-connector`'s
 * output exactly — `(data binary, streamName, partitionKey,
 * sequenceNumber, approximateArrivalTimestamp)` — so
 * [[KinesisSource.toEnvelope]] consumes this source and the real
 * connector interchangeably (reference ingest:
 * real-time-processing-construct.ts:48-52).
 *
 * The "service" behind it is [[KinesisShapedSource]]'s companion
 * registry: named streams with N shards, records routed by partition
 * key, per-shard monotone sequence numbers, TRIM_HORIZON/LATEST
 * starting positions. Replayable by construction — `commit` trims
 * nothing, so any (start, end] range re-plans identically, which is
 * what lets the checkpoint recover a partially processed batch. The
 * registry is JVM-local (executors in `local[n]` share it); a real
 * deployment swaps the registry calls for service fetches — the
 * Spark-side contract (offsets, planning, readers) is what this
 * class exists to pin down.
 */
object KinesisShapedSource {

  /** One stored record: Kinesis' UserRecord analogue. */
  final case class Rec(partitionKey: String, data: Array[Byte],
      sequenceNumber: Long, arrivalUs: Long)

  private final class Stream(val shards: Array[ArrayBuffer[Rec]])

  private val streams =
    new java.util.concurrent.ConcurrentHashMap[String, Stream]()

  /** Create (or reset) a named stream with `nShards` shards. */
  def createStream(name: String, nShards: Int): Unit = {
    require(nShards >= 1, s"need >= 1 shard, got $nShards")
    streams.put(name, new Stream(Array.fill(nShards)(ArrayBuffer.empty[Rec])))
    ()
  }

  def deleteStream(name: String): Unit = { streams.remove(name); () }

  private def stream(name: String): Stream = {
    val s = streams.get(name)
    require(s != null, s"kinesis-shaped stream not found: $name " +
      "(create it with KinesisShapedSource.createStream)")
    s
  }

  /** Append records, routed to shards by partition key (stands in for
   * the service's md5 hash-range routing — stable, key-sticky) with
   * per-shard monotone sequence numbers. `arrivalUs` is supplied by
   * the caller so tests are deterministic. */
  def putRecords(name: String, recs: Seq[(String, Array[Byte])],
      arrivalUs: Long): Unit = {
    val s = stream(name)
    s.synchronized {
      recs.foreach { case (pk, data) =>
        val shard = math.floorMod(pk.hashCode, s.shards.length)
        val buf = s.shards(shard)
        buf += Rec(pk, data, buf.length.toLong, arrivalUs)
      }
    }
  }

  /** Current per-shard record counts — the stream head. */
  private[sources] def shardCounts(name: String): Array[Long] = {
    val s = stream(name)
    s.synchronized(s.shards.map(_.length.toLong))
  }

  /** Records (from, until] ranges are exclusive/inclusive in offset
   * terms: positions [from, until). */
  private[sources] def slice(name: String, shard: Int, from: Long,
      until: Long): Seq[Rec] = {
    // the in-memory registry indexes with Int — past 2^31 records per
    // shard `toInt` would silently wrap and misread; fail loud instead
    require(from >= 0 && until <= Int.MaxValue,
      s"shard offset range [$from, $until) exceeds the registry's Int " +
        s"index space for stream $name shard $shard")
    val s = stream(name)
    s.synchronized(s.shards(shard).slice(from.toInt, until.toInt).toVector)
  }

  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))
}

/** Per-shard consumed-count offsets; JSON is a plain count array
 * (`[3,5]`), the shape the checkpoint offset log round-trips. */
private[sources] case class ShardOffsets(counts: Array[Long]) extends Offset {
  override def json(): String = counts.mkString("[", ",", "]")
}

private[sources] object ShardOffsets {
  def parse(json: String): ShardOffsets = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    ShardOffsets(
      if (body.isEmpty) Array.empty[Long]
      else body.split(",").map(_.trim.toLong))
  }
}

class KinesisShapedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-shaped"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisShapedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with the caller's original key case — rewrap
    val opts = new CaseInsensitiveStringMap(properties)
    new KinesisShapedTable(opts.get("streamName"),
      Option(opts.get("startingPosition")).getOrElse("TRIM_HORIZON"))
  }
}

private[sources] class KinesisShapedTable(streamName: String,
    startingPosition: String) extends Table with SupportsRead {
  require(streamName != null && streamName.nonEmpty,
    "kinesis-shaped requires option streamName")
  require(Set("TRIM_HORIZON", "LATEST").contains(startingPosition),
    s"unsupported startingPosition $startingPosition (TRIM_HORIZON | LATEST)")

  override def name(): String = s"kinesis-shaped:$streamName"
  override def schema(): StructType = KinesisShapedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = KinesisShapedSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KinesisShapedMicroBatchStream(streamName, startingPosition)
    }
}

private[sources] class KinesisShapedMicroBatchStream(streamName: String,
    startingPosition: String) extends MicroBatchStream {

  // LATEST pins the head observed when the query FIRST asks; computed
  // lazily so a fresh-start query skips history but a checkpoint
  // restart (which never calls initialOffset) keeps its own offsets
  private lazy val initial: ShardOffsets =
    if (startingPosition == "LATEST")
      ShardOffsets(KinesisShapedSource.shardCounts(streamName))
    else
      ShardOffsets(KinesisShapedSource.shardCounts(streamName).map(_ => 0L))

  override def initialOffset(): Offset = initial

  override def latestOffset(): Offset =
    ShardOffsets(KinesisShapedSource.shardCounts(streamName))

  override def deserializeOffset(json: String): Offset =
    ShardOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].counts
    val e = end.asInstanceOf[ShardOffsets].counts
    e.indices.flatMap { shard =>
      val from = if (shard < s.length) s(shard) else 0L
      // an end offset BEHIND the committed start means the registry was
      // reset (createStream) under a live checkpointed query — a state
      // structured streaming does not tolerate; silently planning an
      // empty batch would mask the misuse, so fail loud
      require(e(shard) >= from,
        s"stream $streamName shard $shard: end offset ${e(shard)} is behind " +
          s"committed start $from — was the stream reset under a live checkpoint?")
      if (e(shard) > from)
        Some(KinesisShapedPartition(streamName, shard, from, e(shard)): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisShapedReaderFactory

  // a Kinesis consumer commits nothing back to the service — records
  // age out by retention; replayability of (start, end] is the point
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class KinesisShapedPartition(streamName: String,
    shard: Int, from: Long, until: Long) extends InputPartition

private[sources] class KinesisShapedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KinesisShapedPartition]
    new PartitionReader[InternalRow] {
      private val recs =
        KinesisShapedSource.slice(p.streamName, p.shard, p.from, p.until).iterator
      private var cur: KinesisShapedSource.Rec = _
      override def next(): Boolean =
        if (recs.hasNext) { cur = recs.next(); true } else false
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur.data,
        UTF8String.fromString(p.streamName),
        UTF8String.fromString(cur.partitionKey),
        // the service's sequence numbers are shard-scoped strings;
        // shard-prefixing keeps them globally unique like the real ones
        UTF8String.fromString(f"shardId-${p.shard}%012d:${cur.sequenceNumber}%019d"),
        cur.arrivalUs))
      override def close(): Unit = ()
    }
  }
}
