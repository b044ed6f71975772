package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in partition-sized batches.
 *
 * The decode step itself is STUBBED (this container has no image/audio
 * codecs): [[decodeStub]] produces a deterministic fake feature vector
 * (a 16-bin byte histogram) so the Spark-side plumbing — schema,
 * batching, partitioning, feature shape — is real and testable. Swap
 * `decodeBytes` for a real codec (JNI/ONNX/FFmpeg) without touching
 * the plan shape.
 *
 * Scale notes: media rows are processed with `mapPartitions` so a real
 * decoder amortizes model/codec init per PARTITION (the JVM analogue
 * of pandas-batch UDFs); binary payloads never shuffle — derive
 * features first, keep the binary column pruned away downstream.
 */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Extracted features: fixed-length vector + dims actually decoded. */
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, features: Array[Double])

  /** The stubbed per-item decoder: 16-bin byte histogram, L1-normalized.
   * Deterministic stand-in for image decode + feature extraction. */
  def decodeBytes(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(1.0, payload.length.toDouble)
    hist.map(_ / n)
  }

  /** Batch decode: per-partition iteration (decoder init once per
   * partition), typed in/out — the real decoder drops in here. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec/model handles)
      rows.map(r => MediaFeatures(r.media_id, r.kind, r.payload.length, decodeBytes(r.payload)))
    }
  }

  /** "Frame sampling": pick every `stride`-th fixed-size window of the
   * payload as a pseudo-frame (shape-preserving stand-in for video
   * frame extraction). Pure expressions — no shuffle. */
  def frameSample(df: DataFrame, payloadCol: String, frameBytes: Int, stride: Int): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0), greatest(((length(col(payloadCol)) - frameBytes) / stride).cast("int"), lit(0))),
        i => substring(col(payloadCol), (i * stride + 1).cast("int"), lit(frameBytes))))

  /** Synthesize a media table from any string column (for tests and the
   * demo query — stands in for real image bytes). */
  def syntheticMedia(spark: SparkSession, source: DataFrame,
      idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    source.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("kind"),
      col(textCol).cast("binary").as("payload"),
      (length(col(textCol)) % 64 + 1).cast("int").as("width"),
      (length(col(textCol)) % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }
}
