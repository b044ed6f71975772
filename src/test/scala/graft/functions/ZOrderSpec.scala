package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  /** Reference interleave in plain Scala (bit j of input k → j*n+k). */
  private def refKey(bits: Int, xs: Seq[Long]): Long = {
    val mask = (1L << bits) - 1L
    var acc = 0L
    for (k <- xs.indices; j <- 0 until bits)
      acc |= (((xs(k) & mask) >>> j) & 1L) << (j * xs.size + k)
    acc
  }

  test("key matches the reference interleave (codegen path, 2 and 3 dims)") {
    val df = spark.range(0, 500).select(
      ((col("id") * 7919L) % 1024L).as("x"),
      ((col("id") * 104729L) % 1024L).as("y"),
      ((col("id") * 31L) % 8L).as("w"))
    val got2 = df.withColumn("z", ZOrder.key(10, col("x"), col("y")))
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, z) => assert(z === refKey(10, Seq(x, y)), s"($x,$y)") }
    val got3 = df.withColumn("z", ZOrder.key(3, col("x"), col("y"), col("w")))
      .select("x", "y", "w", "z").as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (x, y, w, z) => assert(z === refKey(3, Seq(x, y, w)), s"($x,$y,$w)") }
  }

  test("key is null iff any input is null; interpreted eval agrees with codegen") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(1L)), (Some(2L), None))
      .toDF("x", "y")
    val out = df.select(ZOrder.key(4, col("x"), col("y")).as("z"))
      .as[Option[Long]].collect().toSeq
    assert(out === Seq(Some(refKey(4, Seq(3L, 5L))), None, None))
    // force the interpreted path through a filter on a literal-computed key
    val lit1 = spark.sql("SELECT 1").select(
      ZOrder.key(4, lit(3L), lit(5L)).as("z")).as[Long].head()
    assert(lit1 === refKey(4, Seq(3L, 5L)))
  }

  test("bucket: equi-width with clamping and truncation toward zero") {
    val df = Seq(-5L, 0L, 3L, 1024L, 2047L, 99999L).toDF("v")
    val out = df.select(ZOrder.bucket(col("v"), 0L, 2047L, 10).as("b"))
      .as[Long].collect().toSeq
    // span 2048 over 1024 cells => v/2 truncated, clamped to [0, 1023]
    assert(out === Seq(0L, 0L, 1L, 512L, 1023L, 1023L))
  }

  test("bucket is exact on wide ranges where double division drifts; overflow fails fast") {
    // span 2^43-1 (a realistic microsecond range, NOT a power of two):
    // (c*cells) exceeds 2^53, so the old IEEE-double quotient rounds
    // across a bucket boundary — c = 8796025913343 divides to
    // 1048568 under double arithmetic but 1048567 exactly
    val mx = (1L << 43) - 2L
    val c = 8796025913343L
    val got = Seq(c).toDF("v")
      .select(ZOrder.bucket(col("v"), 0L, mx, 20).as("b")).as[Long].head()
    assert(got === (c * (1L << 20)) / ((1L << 43) - 1L))
    assert(got === 1048567L)
    // span * 2^bits beyond Long: refuse loudly instead of silently
    // mis-bucketing (the 100 TB-layout contract)
    val e = intercept[IllegalArgumentException] {
      ZOrder.bucket(col("v"), 0L, Long.MaxValue - 1L, 20)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("clusteredWrite gives EVERY dimension per-file locality; a single-column sort does not") {
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val df = spark.range(0, 20000).select(
      col("id"),
      ((col("id") * 7919L) % 1024L).as("x"),
      ((col("id") * 104729L) % 1024L).as("y"))
    ZOrder.clusteredWrite(df, Seq(col("x"), col("y")), bits = 10,
      numFiles = 16, path = s"$tmp/z")
    // baseline: same data range-sorted by x alone
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$tmp/x")

    def avgSpan(path: String, dim: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(dim)) - min(col(dim))).as("span"))
        .select("span").as[Long].collect()
      spans.sum.toDouble / spans.length / 1023.0
    }
    val (zx, zy) = (avgSpan(s"$tmp/z", "x"), avgSpan(s"$tmp/z", "y"))
    // z-order: both dimensions tighten (16 files = 4 split bits -> each
    // dim quartered in expectation; allow slack for range sampling)
    assert(zx < 0.8 && zy < 0.8, s"zorder spans x=$zx y=$zy")
    // single-column sort: x collapses but y keeps ~full span per file
    val (sx, sy) = (avgSpan(s"$tmp/x", "x"), avgSpan(s"$tmp/x", "y"))
    assert(sx < 0.2, s"x-sorted x span $sx")
    assert(sy > 0.9, s"x-sorted y span $sy")
    assert(zy < sy, s"zorder must beat single-sort on the second dim: $zy vs $sy")
  }
}
