package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LogHistogramSpec extends SparkTestBase {
  import spark.implicits._

  private def refBin(v: Long): Long =
    if (v < 16) v
    else {
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (bitlen - 4).toLong * 8 + (v >> (bitlen - 4))
    }

  private def refLower(id: Long): Long =
    if (id < 16) id else (8 + id % 8) << (id / 8 - 1).toInt

  test("binId matches the bit-arithmetic reference; lowerBound is its floor inverse") {
    val vs = Seq(0L, 1L, 7L, 8L, 15L, 16L, 17L, 31L, 32L, 100L, 1023L, 1024L,
      86399L, 86400L, (1L << 40) + 12345L)
    vs.foreach { v =>
      val rows = Seq(v).toDF("v").select(
        LogHistogram.binId(col("v")).as("b")).as[Long].head()
      assert(rows === refBin(v), s"v=$v")
      val lo = Seq(refBin(v)).toDF("b")
        .select(LogHistogram.binLowerBound(col("b"))).as[Long].head()
      assert(lo === refLower(refBin(v)), s"v=$v")
      assert(lo <= v, s"lower bound must not exceed the value, v=$v lo=$lo")
      // relative width guarantee: lo > v·(1 − 2^-SubBits) for v ≥ 16
      if (v >= 16) assert(lo.toDouble > v.toDouble * (1.0 - 1.0 / 8 - 1e-9), s"v=$v lo=$lo")
    }
  }

  test("bins are contiguous and order-preserving") {
    val df = spark.range(0, 100000).select(col("id").as("v"))
    val bins = df.select(LogHistogram.binId(col("v")).as("b"))
      .distinct().orderBy("b").as[Long].collect()
    assert(bins.head === 0L)
    assert(bins.toSeq === (bins.head to bins.last)) // no holes
    // order-preserving: bin of v is monotone in v
    val pairs = df.select(col("v"), LogHistogram.binId(col("v")).as("b"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
  }

  test("quantiles from merged per-machine sketches match the flat sketch and bound the exact value") {
    val data = (0 until 5000).map { i =>
      val m = s"line${i % 3}/m${i % 7}"
      (m, ((i * 2654435761L) % 100000L).max(0L))
    }
    val df = data.toDF("id", "dur")
    val perMachine = LogHistogram.sketch(df, Seq(col("id")), col("dur"))
    val perLine = perMachine
      .groupBy(split_part(col("id"), lit("/"), lit(1)).as("g"), col("bin"))
      .agg(sum(col("n")).as("n"))
    val flat = LogHistogram.sketch(
      df.withColumn("g", split_part(col("id"), lit("/"), lit(1))),
      Seq(col("g")), col("dur"))
    assert(perLine.orderBy("g", "bin").collect().toSeq ===
      flat.orderBy("g", "bin").collect().toSeq, "additive merge == flat sketch")

    val approx = LogHistogram.quantiles(perLine, Seq("g"), Seq(0.5, 0.9))
      .as[(String, Double, Long)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    // exact per-group percentiles for the bound check
    data.groupBy(_._1.split("/")(0)).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      for (q <- Seq(0.5, 0.9)) {
        val exact = sorted(math.ceil(sorted.size * q).toInt - 1)
        val got = approx((g, q))
        // sketch returns the bin lower bound: within one bin width below
        assert(got <= exact, s"g=$g q=$q got=$got exact=$exact")
        assert(got.toDouble >= exact.toDouble * (1.0 - 1.0 / 8) - 1.0,
          s"g=$g q=$q got=$got exact=$exact")
      }
    }
  }
}
