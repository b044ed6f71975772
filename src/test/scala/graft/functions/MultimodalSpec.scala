package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("decode stub: per-partition batch decode produces fixed-shape features") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.features.length == 16)) // fixed feature shape
    assert(feats.forall(f => math.abs(f.features.sum - 1.0) < 1e-9)) // L1-normalized
    assert(feats.forall(f => f.n_bytes > 0))
  }

  test("decode is deterministic (same payload, same features)") {
    val f1 = Multimodal.decodeBytes("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeBytes("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
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
    assert(Multimodal.decodeStub(media).rdd.getNumPartitions == 8)
    assert(Multimodal.decodeStub(media).count() == docs.count())
  }
}
