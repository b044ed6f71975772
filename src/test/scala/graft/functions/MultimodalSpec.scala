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

  test("real PNG decode: dimensions and channel means extracted") {
    val red = pngBytes(8, 4, 0xff0000)
    val (ok, f) = Multimodal.decodeBytes(red)
    assert(ok)
    assert(f(0) == 8.0 && f(1) == 4.0) // width, height
    assert(f(2) == 3.0)                // RGB components
    assert(f(3) == 1.0 && f(4) == 0.0 && f(5) == 0.0) // solid red
    // mixed-intensity image: means in (0, 1)
    val grey = pngBytes(4, 4, 0x808080)
    val (_, g) = Multimodal.decodeBytes(grey)
    assert(g(3) == g(4) && g(4) == g(5) && g(3) > 0.49 && g(3) < 0.51)
  }

  test("non-image payloads fall back to the byte-histogram fingerprint") {
    val (ok, f) = Multimodal.decodeBytes("hello world".getBytes("UTF-8"))
    assert(!ok)
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0) < 1e-9) // L1-normalized
  }

  test("per-partition batch decode over a MIXED corpus keeps a fixed feature shape") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val textMedia = Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
    val imgMedia = Seq(
      Multimodal.MediaRow(9001L, "image/png", pngBytes(5, 3, 0x00ff00), 5, 3),
      Multimodal.MediaRow(9002L, "image/png", pngBytes(2, 2, 0x0000ff), 2, 2)).toDS()
    val feats = Multimodal.decode(textMedia.unionByName(imgMedia)).collect()
    assert(feats.length == 52)
    assert(feats.forall(_.features.length == 16)) // fixed feature shape
    assert(feats.forall(f => f.n_bytes > 0))
    val images = feats.filter(_.decoded)
    assert(images.map(_.media_id).toSet == Set(9001L, 9002L))
    assert(images.find(_.media_id == 9001L).get.features.take(3).toSeq == Seq(5.0, 3.0, 3.0))
  }

  test("decode is deterministic (same payload, same features)") {
    val f1 = Multimodal.decodeBytes(pngBytes(3, 3, 0x123456))
    val f2 = Multimodal.decodeBytes(pngBytes(3, 3, 0x123456))
    assert(f1._1 && f1._2.toSeq == f2._2.toSeq)
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
