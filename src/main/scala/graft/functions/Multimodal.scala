package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in partition-sized batches.
 *
 * The image and audio paths are REAL: [[decodeImage]] decodes any
 * `javax.imageio` format available in the JDK (PNG, BMP, GIF, JPEG)
 * and emits dimension + per-channel-intensity features;
 * [[decodeAudio]] decodes any `javax.sound.sampled` container
 * (WAV, AIFF, AU — PCM) and emits rate/channel/depth/duration plus
 * RMS-and-peak amplitude features. Payloads that are neither fall
 * back to [[byteHistogram]], a deterministic 16-bin content
 * fingerprint, so the pipeline is total over mixed/corrupt corpora
 * (decode failures are data, not exceptions). Remaining modalities
 * (video, compressed audio codecs) stay behind the same seam — add a
 * decoder to [[decodeBytes]]'s chain without touching the plan shape.
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

  /** Extracted features: fixed-length vector + the modality actually
   * decoded ("image" | "audio" | "binary" fallback). `decoded` is
   * modality != binary — a real decoder understood the payload. */
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, decoded: Boolean, modality: String, features: Array[Double])

  /** Image features: [width, height, nComponents, meanR, meanG, meanB]
   * with channel means normalized to [0,1]. None when the payload is
   * not a decodable image (ImageIO returns null / throws). */
  def decodeImage(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h * 255.0
        Some(Array(w.toDouble, h.toDouble,
          img.getColorModel.getNumComponents.toDouble, sr / n, sg / n, sb / n))
      }
    } catch { case _: Exception => None }

  /** Fallback fingerprint for non-image payloads: 16-bin byte
   * histogram, L1-normalized. Deterministic. */
  def byteHistogram(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(1.0, payload.length.toDouble)
    hist.map(_ / n)
  }

  /** Audio features via the JDK's `javax.sound.sampled` (WAV/AIFF/AU):
   * [sampleRate, channels, bitDepth, frames, durationSec, rms, peak].
   * Sample statistics cover the PCM encodings the JDK parses natively
   * (signed 16-bit either endianness, signed/unsigned 8-bit); other
   * encodings still yield the container metadata with zero rms/peak.
   * None when the payload is not a parseable audio container. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Double]] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val bytes = in.readAllBytes()
        val samples: Array[Double] =
          if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16 && bytes.length >= 2) {
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            Array.tabulate(bytes.length / 2)(i => bb.getShort(i * 2) / 32768.0)
          } else if (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
            bytes.map(b => ((b & 0xff) - 128) / 128.0)
          else if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 8)
            bytes.map(_ / 128.0)
          else Array.empty[Double]
        var sq = 0.0; var peak = 0.0
        samples.foreach { s => sq += s * s; peak = math.max(peak, math.abs(s)) }
        val frames =
          if (fmt.getFrameSize > 0) bytes.length.toDouble / fmt.getFrameSize else 0.0
        val dur = if (fmt.getFrameRate > 0) frames / fmt.getFrameRate else 0.0
        Some(Array(fmt.getSampleRate.toDouble, fmt.getChannels.toDouble, bits.toDouble,
          frames, dur, math.sqrt(sq / math.max(1, samples.length)), peak))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Total per-item decoder chain: image, then audio, then the byte
   * histogram (all padded to the same 16-element shape so the feature
   * column stays fixed-width). Returns (modality, features). */
  def decodeBytes(payload: Array[Byte]): (String, Array[Double]) =
    decodeImage(payload) match {
      case Some(f) => ("image", f.padTo(16, 0.0))
      case None => decodeAudio(payload) match {
        case Some(f) => ("audio", f.padTo(16, 0.0))
        case None => ("binary", byteHistogram(payload))
      }
    }

  /** Batch decode: per-partition iteration (decoder init once per
   * partition), typed in/out — additional codecs drop in here. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec/model handles)
      rows.map { r =>
        val (modality, feats) = decodeBytes(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          modality != "binary", modality, feats)
      }
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
