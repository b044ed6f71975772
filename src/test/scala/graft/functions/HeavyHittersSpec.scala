package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish stream: item k appears ~3000/k times, plus a long tail
  // of singletons that must NOT shuffle in pass 2
  private val stream: Seq[String] =
    (1 to 40).flatMap(k => Seq.fill(3000 / k)(s"hot$k")) ++
      (0 until 5000).map(i => s"tail$i")

  private def naive(df: org.apache.spark.sql.DataFrame, phi: Double) = {
    val n = df.count()
    df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= math.ceil(phi * n).toLong)
      .as[(String, Long)].collect().toSet
  }

  test("output is bit-identical to the naive GROUP BY HAVING, any partitioning") {
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("v").repartition(parts)
      val got = HeavyHitters.aboveFraction(df, col("v"), phi = 1.0 / 100)
        .as[(String, Long)].collect().toSet
      assert(got === naive(df, 1.0 / 100), s"parts=$parts")
      assert(got.nonEmpty && got.size < 40, s"parts=$parts sanity")
    }
  }

  test("adversarial ordering cannot evict a true heavy hitter (MG superset guarantee)") {
    // the heavy item arrives FIRST, then a flood of distinct values
    // drives decrement-all rounds — the guarantee must still hold
    val adversarial = Seq.fill(400)("HH") ++ (0 until 20000).map(i => s"d$i")
    val df = adversarial.toDF("v").repartition(3)
    val got = HeavyHitters.aboveFraction(df, col("v"), phi = 0.01)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("HH", 400L)))
  }

  test("nulls are skipped; phi > max frequency yields the empty set") {
    val df = ((0 until 100).map(i => Option(s"v${i % 50}")) ++ Seq(None, None)).toDF("v")
    val got = HeavyHitters.aboveFraction(df, col("v"), phi = 1.0)
    assert(got.count() === 0L)
    val one = Seq("x", "x", "x").toDF("v")
    assert(HeavyHitters.aboveFraction(one, col("v"), phi = 1.0)
      .as[(String, Long)].collect().toSeq === Seq(("x", 3L)))
  }
}
