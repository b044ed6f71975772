package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("exact below k; estimator within the KMV envelope above k") {
    for ((n, k) <- Seq((100, 256), (5000, 256), (20000, 512))) {
      val df = spark.range(0, n.toLong).select(lit("g").as("g"),
        concat(lit("u"), col("id")).as("v"))
      val est = Kmv.estimate(Kmv.sketch(df, Seq("g"), col("v"), k), Seq("g"), k)
        .select("estimate").as[Double].head()
      if (n < k) assert(est === n.toDouble, s"below k must be exact, n=$n")
      else {
        val err = math.abs(est - n) / n
        // std error ~ 1/sqrt(k-2); allow 4 sigma
        assert(err < 4.0 / math.sqrt(k - 2.0), s"n=$n k=$k est=$est err=$err")
      }
    }
  }

  test("null values are skipped, never burn a sketch slot") {
    val df = (Seq(Some("a"), None, Some("b")) ++ (1 to 50).map(i => Some(s"x$i")))
      .toDF("v").select(lit("g").as("g"), col("v"))
    val sk = Kmv.sketch(df, Seq("g"), col("v"), k = 256)
    assert(sk.count() === 52L) // 52 distinct non-null values, no null row
    assert(sk.filter(col("h").isNull).count() === 0L)
    val est = Kmv.estimate(sk, Seq("g"), 256).select("estimate").as[Double].head()
    assert(est === 52.0)
  }

  test("merge is idempotent and commutative — the streaming-safe algebra") {
    val a = spark.range(0, 3000).select(lit("g").as("g"), concat(lit("a"), col("id") % 900).as("v"))
    val b = spark.range(0, 3000).select(lit("g").as("g"), concat(lit("b"), col("id") % 400).as("v"))
    val (ska, skb) = (Kmv.sketch(a, Seq("g"), col("v"), 128), Kmv.sketch(b, Seq("g"), col("v"), 128))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "h").as[(String, Long)].collect().toSet
    val ab = Kmv.merge(ska.unionByName(skb), Seq("g"), 128)
    val ba = Kmv.merge(skb.unionByName(ska), Seq("g"), 128)
    assert(rows(ab) === rows(ba), "commutative")
    val replay = Kmv.merge(ab.unionByName(ska), Seq("g"), 128)
    assert(rows(replay) === rows(ab), "idempotent under replay")
    // theta property: merge of sketches == sketch of the union
    val flat = Kmv.sketch(a.unionByName(b), Seq("g"), col("v"), 128)
    assert(rows(ab) === rows(flat), "bottom-k of sketches == bottom-k of union")
  }

  test("inclusion-exclusion intersection tracks the true overlap") {
    // A = 0..1999, B = 1000..2999 → |A∩B| = 1000
    val a = spark.range(0, 2000).select(lit("A").as("g"), concat(lit("u"), col("id")).as("v"))
    val b = spark.range(1000, 3000).select(lit("B").as("g"), concat(lit("u"), col("id")).as("v"))
    val k = 512
    val sk = Kmv.sketch(a.unionByName(b), Seq("g"), col("v"), k)
    val est = Kmv.estimate(sk, Seq("g"), k)
      .select("g", "estimate").as[(String, Double)].collect().toMap
    val u = Kmv.estimate(Kmv.merge(sk, Seq.empty, k), Seq.empty, k)
      .select("estimate").as[Double].head()
    val inter = est("A") + est("B") - u
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.35,
      s"A=${est("A")} B=${est("B")} U=$u inter=$inter")
  }

  test("direct theta-intersection: exact in the exact regime, zero pairs kept") {
    // all three sets below k ⇒ sketches are the full sets, θ = 1,
    // estimate = exact |A∩B|; the C×A and C×B rows exist with 0
    val a = spark.range(0, 60).select(lit("A").as("g"), concat(lit("u"), col("id")).as("v"))
    val b = spark.range(30, 90).select(lit("B").as("g"), concat(lit("u"), col("id")).as("v"))
    val c = spark.range(0, 10).select(lit("C").as("g"), concat(lit("z"), col("id")).as("v"))
    val sk = Kmv.sketch(a.unionByName(b).unionByName(c), Seq("g"), col("v"), k = 256)
    val out = Kmv.intersectEstimate(sk, "g", k = 256)
      .select("ga", "gb", "n_common", "estimate")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) == ((30L, 30.0)))
    assert(out(("A", "C")) == ((0L, 0.0)))
    assert(out(("B", "C")) == ((0L, 0.0)))
  }

  test("direct theta-intersection beats inclusion-exclusion shape on a small overlap") {
    // |A| = |B| = 4000, |A∩B| = 200 (5%) at k = 256 — the regime where
    // inclusion-exclusion is a difference of three noisy numbers
    val a = spark.range(0, 4000).select(lit("A").as("g"), concat(lit("u"), col("id")).as("v"))
    val b = spark.range(3800, 7800).select(lit("B").as("g"), concat(lit("u"), col("id")).as("v"))
    val k = 256
    val sk = Kmv.sketch(a.unionByName(b), Seq("g"), col("v"), k)
    val direct = Kmv.intersectEstimate(sk, "g", k)
      .select("estimate").as[Double].head()
    assert(math.abs(direct - 200.0) / 200.0 < 0.75,
      s"direct θ-intersection estimate $direct vs truth 200")
    // determinism + partitioning invariance (exact integer θ space)
    val again = Kmv.intersectEstimate(sk.repartition(13), "g", k)
      .select("ga", "gb", "n_common", "estimate")
      .as[(String, String, Long, Double)].collect().toSet
    val first = Kmv.intersectEstimate(sk, "g", k)
      .select("ga", "gb", "n_common", "estimate")
      .as[(String, String, Long, Double)].collect().toSet
    assert(again == first)
  }

  test("estimate and intersectEstimate share one theta convention (θ = k-th min)") {
    // at capacity both estimators must use θ = h_max (the k-th
    // minimum) with strictly-below counting — exactly k−1 retained
    // hashes below θ, so estimate == (k−1)/(θ/2³²) and a group
    // intersected with ITSELF (two copies under different labels)
    // counts k−1 common hashes below θ_min
    val k = 64
    val base = spark.range(0, 5000)
    val two = base.select(lit("A").as("g"), concat(lit("u"), col("id")).as("v"))
      .unionByName(base.select(lit("B").as("g"), concat(lit("u"), col("id")).as("v")))
    val sk = Kmv.sketch(two, Seq("g"), col("v"), k)
    val hmax = sk.filter(col("g") === "A").agg(max(col("h"))).as[Long].head()
    val est = Kmv.estimate(sk, Seq("g"), k)
      .filter(col("g") === "A").select("estimate").as[Double].head()
    assert(est === (k - 1).toDouble / (hmax.toDouble / 4294967296.0))
    val inter = Kmv.intersectEstimate(sk, "g", k)
      .select("n_common", "estimate").as[(Long, Double)].head()
    assert(inter._1 === (k - 1).toLong, "identical sketches: k-1 common below θ")
    assert(inter._2 === est, "self-intersection estimate == distinct estimate")
  }
}
