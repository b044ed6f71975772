package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** JVM-global accounting for the frame-decoder lifecycle (local-mode
 * executors share the JVM, so static counters observe executor-side
 * loads — same pattern as EmbedCounters). */
object FrameCounters {
  val loads = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { loads.set(0); closes.set(0) }
}

/** Counting fake over the shipped GIF decoder — proves explodeFrames
 * drives the seam with the load-once / close-always contract. */
final case class CountingFrameLoader() extends Multimodal.FrameDecoderLoader {
  def load(): Multimodal.FrameDecoder = {
    FrameCounters.loads.incrementAndGet()
    val inner = Multimodal.GifFrameDecoderLoader.load()
    new Multimodal.FrameDecoder {
      val name = "counting-" + inner.name
      def frameCount(payload: Array[Byte]): Int = inner.frameCount(payload)
      def sampleFrames(payload: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
        inner.sampleFrames(payload, maxFrames)
      def close(): Unit = { FrameCounters.closes.incrementAndGet(); inner.close() }
    }
  }
}

class MultimodalSpec extends SparkTestBase {

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(sampleRate: Float, amplitude: Double, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit signed mono PCM sine at 1/8 the sample rate
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nFrames)
      bb.putShort(i * 2, (amplitude * 32767.0 * math.sin(2 * math.Pi * i / 8.0)).toShort)
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A REAL animated GIF: n solid frames stepping from black to white,
   * written with the JDK's sequence-capable GIF writer. */
  private def animatedGifBytes(w: Int, h: Int, nFrames: Int, delayCs: Int = 10): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until nFrames) {
      val v = if (nFrames == 1) 0 else i * 255 / (nFrames - 1)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromBufferedImageType(
          java.awt.image.BufferedImage.TYPE_INT_RGB), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      tree.appendChild(gce)
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new IIOImage(img, null, md), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    out.toByteArray
  }

  test("real animated-GIF decode: frame count, dims, timing, luminance ramp") {
    val gif = animatedGifBytes(6, 4, nFrames = 5, delayCs = 20)
    val (modality, f) = Multimodal.decodeBytes(gif)
    assert(modality == "video")
    assert(f(0) == 5.0)               // frames
    assert(f(1) == 6.0 && f(2) == 4.0) // width, height
    assert(f(3) == 20.0)              // avg delay (cs)
    assert(math.abs(f(4) - 1.0) < 1e-9) // 5 × 20 cs = 1.0 s
    // black → grey → white ramp across sampled frames
    assert(f(5) < 0.05 && f(6) > 0.3 && f(6) < 0.7 && f(7) > 0.95)
    // a single-frame GIF is an image, not a video
    assert(Multimodal.decodeBytes(animatedGifBytes(3, 3, nFrames = 1))._1 == "image")
  }

  test("videoFrames extracts decodable evenly-spaced PNG frames") {
    val gif = animatedGifBytes(8, 8, nFrames = 7)
    val frames = Multimodal.videoFrames(gif, maxFrames = 3)
    assert(frames.length == 3)
    val lums = frames.map { png =>
      val Some(feat) = Multimodal.decodeImage(png): @unchecked
      (feat(3) + feat(4) + feat(5)) / 3.0 // mean channel intensity
    }
    // first/mid/last of the black→white ramp, each a REAL decodable PNG
    assert(lums(0) < 0.05 && lums(1) > 0.3 && lums(1) < 0.7 && lums(2) > 0.95)
    // non-video payloads yield no frames
    assert(Multimodal.videoFrames("not media".getBytes, 3).isEmpty)
  }

  test("resizeImage is a real raster resize") {
    val big = pngBytes(16, 8, 0x00ff00)
    val Some(small) = Multimodal.resizeImage(big, 4, 2): @unchecked
    val Some(f) = Multimodal.decodeImage(small): @unchecked
    assert(f(0) == 4.0 && f(1) == 2.0)
    assert(f(4) > 0.99) // still green after scaling
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("explodeFrames: video rows explode to image rows, others vanish") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "video/gif", animatedGifBytes(6, 6, nFrames = 9), 6, 6),
      Multimodal.MediaRow(2L, "image/png", pngBytes(4, 4, 0xff0000), 4, 4),
      Multimodal.MediaRow(3L, "text/plain", "plain".getBytes, 0, 0)).toDS()
    val frames = Multimodal.explodeFrames(media, maxFrames = 4).collect()
    assert(frames.map(_.media_id).toSet == Set(1L))
    assert(frames.length == 4)
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    frames.foreach(fr => assert(Multimodal.decodeImage(fr.frame_png).nonEmpty))
  }

  test("explodeFrames decoder seam: loads once per non-empty partition, closes every load") {
    import spark.implicits._
    FrameCounters.reset()
    val media = (1L to 12L).map { i =>
      Multimodal.MediaRow(i, "video/gif", animatedGifBytes(4, 4, nFrames = 5), 4, 4)
    }.toDS().repartition(3)
    val frames = Multimodal.explodeFrames(media, maxFrames = 2,
      loader = CountingFrameLoader()).collect()
    assert(frames.length === 24) // 12 videos x 2 sampled frames
    assert(FrameCounters.loads.get() > 0)
    assert(FrameCounters.loads.get() <= 3, "at most one decoder load per partition")
    assert(FrameCounters.closes.get() === FrameCounters.loads.get(),
      "every loaded decoder must be closed at task completion")
  }

  test("real PNG decode: dimensions and channel means extracted") {
    val red = pngBytes(8, 4, 0xff0000)
    val (modality, f) = Multimodal.decodeBytes(red)
    assert(modality == "image")
    assert(f(0) == 8.0 && f(1) == 4.0) // width, height
    assert(f(2) == 3.0)                // RGB components
    assert(f(3) == 1.0 && f(4) == 0.0 && f(5) == 0.0) // solid red
    // mixed-intensity image: means in (0, 1)
    val grey = pngBytes(4, 4, 0x808080)
    val (_, g) = Multimodal.decodeBytes(grey)
    assert(g(3) == g(4) && g(4) == g(5) && g(3) > 0.49 && g(3) < 0.51)
  }

  test("real WAV decode: rate/channels/depth/duration and amplitude stats") {
    val wav = wavBytes(sampleRate = 8000f, amplitude = 0.5, nFrames = 800)
    val (modality, f) = Multimodal.decodeBytes(wav)
    assert(modality == "audio")
    assert(f(0) == 8000.0) // sample rate
    assert(f(1) == 1.0)    // mono
    assert(f(2) == 16.0)   // bit depth
    assert(f(3) == 800.0)  // frames
    assert(math.abs(f(4) - 0.1) < 1e-6) // 800 frames @ 8 kHz = 0.1 s
    // sine at amplitude 0.5: rms ≈ 0.5/√2, peak ≈ 0.5
    assert(math.abs(f(5) - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(f(6) - 0.5) < 0.01)
  }

  test("non-media payloads fall back to the byte-histogram fingerprint") {
    val (modality, f) = Multimodal.decodeBytes("hello world".getBytes("UTF-8"))
    assert(modality == "binary")
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0) < 1e-9) // L1-normalized
  }

  test("per-partition batch decode over a MIXED corpus keeps a fixed feature shape") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val textMedia = Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
    val binMedia = Seq(
      Multimodal.MediaRow(9001L, "image/png", pngBytes(5, 3, 0x00ff00), 5, 3),
      Multimodal.MediaRow(9002L, "image/png", pngBytes(2, 2, 0x0000ff), 2, 2),
      Multimodal.MediaRow(9003L, "audio/wav", wavBytes(16000f, 0.25, 160), 0, 0)).toDS()
    val feats = Multimodal.decode(textMedia.unionByName(binMedia)).collect()
    assert(feats.length == 53)
    assert(feats.forall(_.features.length == 16)) // fixed feature shape
    assert(feats.forall(f => f.n_bytes > 0))
    val byModality = feats.groupBy(_.modality)
    assert(byModality("image").map(_.media_id).toSet == Set(9001L, 9002L))
    assert(byModality("audio").map(_.media_id).toSet == Set(9003L))
    assert(byModality("binary").length == 50)
    assert(feats.forall(f => f.decoded == (f.modality != "binary")))
    assert(feats.find(_.media_id == 9001L).get.features.take(3).toSeq == Seq(5.0, 3.0, 3.0))
    assert(feats.find(_.media_id == 9003L).get.features(0) == 16000.0)
  }

  test("decode is deterministic (same payload, same features)") {
    val f1 = Multimodal.decodeBytes(pngBytes(3, 3, 0x123456))
    val f2 = Multimodal.decodeBytes(pngBytes(3, 3, 0x123456))
    assert(f1._1 == "image" && f1._2.toSeq == f2._2.toSeq)
  }

  test("frame sampling yields fixed-size windows over the payload") {
    import spark.implicits._
    val df = Seq(("0123456789abcdef")).toDF("payload")
      .select(col("payload").cast("binary").as("payload"))
    val frames = Multimodal.frameSample(df, "payload", frameBytes = 4, stride = 4)
      .select(col("frames")).as[Seq[Array[Byte]]].head()
    assert(frames.map(new String(_, "UTF-8")) == Seq("0123", "4567", "89ab", "cdef"))
  }

  test("ByteWindow decoder: video dispatch, even spacing, deterministic fingerprints") {
    import spark.implicits._
    val d = Multimodal.ByteWindowFrameDecoderLoader(frameBytes = 4, stride = 2).load()
    // 12 bytes, window 4 @ stride 2 → 5 windows → video
    val payload = "0123456789ab".getBytes("UTF-8")
    assert(d.frameCount(payload) === 5)
    assert(d.frameCount("abc".getBytes("UTF-8")) === 1) // single window: not video
    // maxFrames 3 over 5 windows: j·(n−1)/(want−1) → windows 0, 2, 4
    val frames = d.sampleFrames(payload, 3)
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString.getBytes("UTF-8"))
    assert(frames.map(_.toSeq) === Seq("0123", "4567", "89ab").map(w => fp(w).toSeq))
    // through the real plumbing: non-video rows vanish, frame_idx is 0-based
    val media = Seq(
      Multimodal.MediaRow(1L, "v", payload, 0, 0),
      Multimodal.MediaRow(2L, "v", "abc".getBytes("UTF-8"), 0, 0)).toDS()
    val out = Multimodal.explodeFrames(media, maxFrames = 3,
        Multimodal.ByteWindowFrameDecoderLoader(4, 2))
      .collect().map(f => (f.media_id, f.frame_idx)).toSeq
    assert(out === Seq((1L, 0), (1L, 1), (1L, 2)))
  }

  test("binary columns survive partition-parallel processing") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticMedia(spark, docs, "doc_id", "text").repartition(8)
    assert(Multimodal.decode(media).rdd.getNumPartitions == 8)
    assert(Multimodal.decode(media).count() == docs.count())
  }

  test("codecDigest: real encode+decode round-trips match the closed-form formulas") {
    import spark.implicits._
    val ids = (0L until 21L).toDF("doc_id")
    val digests = Multimodal.codecDigest(Multimodal.syntheticCodecCorpus(spark, ids))
      .collect().map(d => d.media_id -> d).toMap
    assert(digests.size == 21)
    // id 0 → PNG 4×3, gray (x*7 + y*13) % 256
    val png = digests(0L)
    assert(png.modality == "image" && png.dim_a == 4 && png.dim_b == 3 && png.n_frames == 1)
    val expPng = 3L * (for (y <- 0 until 3; x <- 0 until 4) yield (x * 7 + y * 13) % 256).sum
    assert(png.pix_sum == expPng)
    // id 1 → WAV, n = 51 samples of ((31 + i*7) % 65536) - 32768
    val wav = digests(1L)
    val expSamples = (0 until 51).map(i => ((31L + i * 7) % 65536 - 32768).toInt)
    assert(wav.modality == "audio" && wav.dim_a == 8000 && wav.n_frames == 51)
    assert(wav.dim_b == expSamples.map(math.abs).max && wav.pix_sum == expSamples.map(_.toLong).sum)
    // id 2 → GIF 3+2%4=5 wide... w=3+2=5? (2%4=2 → w=5), h=2+2%3=4, nf=4
    val gif = digests(2L)
    assert(gif.modality == "video" && gif.dim_a == 5 && gif.dim_b == 4 && gif.n_frames == 4)
    val expGif = (0 until 4).map(f => 3L * ((2 * 37 + f * 41) % 256) * 5 * 4).sum
    assert(gif.pix_sum == expGif)
    // an undecodable payload degrades to a binary row, not a failure
    val junk = Seq(Multimodal.MediaRow(99L, "bin", Array[Byte](1, 2, 3, 4), 0, 0)).toDS()
    val fallback = Multimodal.codecDigest(junk).head()
    assert(fallback.modality == "binary" && fallback.pix_sum == 4L)
  }

  test("codecDigest: corrupt payloads behind VALID magic degrade per record") {
    import spark.implicits._
    // valid PNG magic, garbage body (ImageIO.read returns null);
    // valid RIFF magic, truncated body (javax.sound throws); a real
    // PNG rides in the same batch and must still decode
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    val riffMagic = "RIFF1234".getBytes ++ Array[Byte](9, 9)
    val gifMagic = "GIF89a".getBytes ++ Array[Byte](0, 0)
    val good = Multimodal.syntheticCodecCorpus(spark, Seq(0L).toDF("doc_id")).collect().head
    val batch = Seq(
      Multimodal.MediaRow(1L, "image/png", pngMagic, 0, 0),
      Multimodal.MediaRow(2L, "audio/wav", riffMagic, 0, 0),
      Multimodal.MediaRow(3L, "video/gif", gifMagic, 0, 0),
      good).toDS()
    val out = Multimodal.codecDigest(batch).collect().map(d => d.media_id -> d).toMap
    assert(out.size == 4, "one bad record must never fail the batch")
    assert(out(1L).modality == "binary" && out(1L).pix_sum == pngMagic.length.toLong)
    assert(out(2L).modality == "binary" && out(2L).pix_sum == riffMagic.length.toLong)
    assert(out(3L).modality == "binary" && out(3L).pix_sum == gifMagic.length.toLong)
    assert(out(good.media_id).modality == "image")
  }
}
