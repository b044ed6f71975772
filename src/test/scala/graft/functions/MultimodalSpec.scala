package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

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

  test("binary columns survive partition-parallel processing") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticMedia(spark, docs, "doc_id", "text").repartition(8)
    assert(Multimodal.decode(media).rdd.getNumPartitions == 8)
    assert(Multimodal.decode(media).count() == docs.count())
  }
}
