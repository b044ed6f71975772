package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.HllSketch
import org.apache.spark.sql.functions._

class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("index/rank derivation matches an independent big-integer reading of md5") {
    for (s <- Seq("42", "abc", "s0/a0/line0/m1", "", "élève")) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val big = new java.math.BigInteger(1, d)
      // top 52 bits of the 128-bit digest
      val hv = big.shiftRight(128 - 52)
      val expIdx = hv.shiftRight(42).intValueExact()
      val w = hv.shiftRight(2).and(java.math.BigInteger.valueOf((1L << 40) - 1L))
      val expRank = if (w.signum == 0) 41 else 41 - w.bitLength()
      assert(HllSketch.indexAndRank(s.getBytes("UTF-8")) === (expIdx, expRank), s"value=$s")
    }
  }

  test("estimate lands within the HLL error envelope at several cardinalities") {
    for (n <- Seq(50, 200, 1000, 20000)) {
      val df = spark.range(0, n.toLong).select(concat(lit("u"), col("id")).as("v"))
      val est = df.agg(Hll.sketch(col("v")).as("sk"))
        .select(Hll.stats(col("sk")).getField("estimate")).as[Double].head()
      val err = math.abs(est - n) / n
      // 1024 registers => ~3.2 % std error; 4 sigma of slack
      assert(err < 0.13, s"n=$n est=$est err=$err")
    }
  }

  test("merge of per-shard sketches equals the flat sketch (register-exact)") {
    val df = spark.range(0, 5000)
      .select(concat(lit("u"), (col("id") % 700)).as("v"),
        (col("id") % 6).as("shard"))
    val flat = df.agg(Hll.sketch(col("v")).as("sk"))
      .select(col("sk")).as[Array[Byte]].head()
    val merged = df.groupBy(col("shard")).agg(Hll.sketch(col("v")).as("sk"))
      .agg(Hll.merge(col("sk")).as("sk"))
      .select(col("sk")).as[Array[Byte]].head()
    assert(merged.toSeq === flat.toSeq)
  }

  test("sketch is partitioning-invariant (deterministic registers)") {
    val df = spark.range(0, 3000).select(concat(lit("x"), (col("id") % 333)).as("v"))
    val a = df.repartition(1).agg(Hll.sketch(col("v"))).as[Array[Byte]].head()
    val b = df.repartition(11).agg(Hll.sketch(col("v"))).as[Array[Byte]].head()
    assert(a.toSeq === b.toSeq)
  }

  test("stats: harmonic sum is the exact integer invariant; both estimate branches fire") {
    // small cardinality: linear-counting branch
    val regsSmall = new Array[Byte](HllSketch.M)
    regsSmall(3) = 5; regsSmall(900) = 1
    val (v1, s1, est1) = HllSketch.stats(regsSmall)
    assert(v1 === HllSketch.M - 2)
    assert(s1 === (HllSketch.M - 2).toLong * (1L << HllSketch.RankCap) +
      (1L << (HllSketch.RankCap - 5)) + (1L << (HllSketch.RankCap - 1)))
    assert(est1 === HllSketch.M.toDouble * math.log(HllSketch.M.toDouble / v1))
    // saturated registers: raw branch (v == 0)
    val regsBig = Array.fill[Byte](HllSketch.M)(7)
    val (v2, s2, est2) = HllSketch.stats(regsBig)
    assert(v2 === 0)
    assert(est2 === HllSketch.AlphaNumerator / s2.toDouble)
  }

  test("null values are skipped; mismatched sketch sizes fail loud") {
    val df = Seq(Some("a"), None, Some("b")).toDF("v")
    val (v, _, _) = HllSketch.stats(
      df.agg(Hll.sketch(col("v"))).as[Array[Byte]].head())
    assert(v === HllSketch.M - 2) // exactly two registers touched
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(Hll.merge(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }
}
