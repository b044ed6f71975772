package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GlobalRankSpec extends SparkTestBase {

  test("global rank equals the single-partition window rank (O3 semantics)") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 997).as("k"), col("id"))
    val expected = df.select(col("id"),
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long").as("rn"))
      .as[(Long, Long)].collect().toMap
    val got = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")), "rn")
      .select(col("id"), col("rn")).as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("rank is a bijection onto 1..n consistent with the sort order (property)") {
    import spark.implicits._
    for (seed <- Seq(11L, 29L)) {
      val df = spark.range(0, 500)
        .select(col("id"), ((col("id") * seed + 17) % 83).as("k"))
      val rows = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")), "rn")
        .select("k", "id", "rn").as[(Long, Long, Long)].collect()
      assert(rows.map(_._3).sorted.toSeq === (1L to 500L), s"seed=$seed not a bijection")
      // rank order is exactly the (k, id) sort order
      assert(rows.sortBy(_._3).map(r => (r._1, r._2)).toSeq ===
        rows.map(r => (r._1, r._2)).sortBy(identity).toSeq, s"seed=$seed order mismatch")
    }
  }

  test("rank + running sum equals the single-partition window formulation") {
    import spark.implicits._
    val df = spark.range(0, 777).select(
      (col("id") * 2654435761L % 101).as("k"), col("id"),
      ((col("id") * 7) % 50 + 1).cast("double").as("v"))
    val w = Window.orderBy(col("k"), col("id"))
    val expected = df.select(col("id"),
        row_number().over(w).cast("long").as("rn"),
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val got = GlobalRank.withRankAndRunningSum(
        df.repartition(6), Seq(col("k"), col("id")), col("v"), "rn", "cum")
      .select(col("id"), col("rn"), col("cum"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("the ranking plan has no Window and sorts range-partitioned (scale shape)") {
    val df = spark.range(0, 10000).repartition(4).select(col("id"), (col("id") % 7).as("k"))
    val ranked = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")), "rn")
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
    // the sort pre-pass plans as Exchange rangepartitioning — parallel
    // by construction (AQE may still coalesce TINY data to one
    // partition; what matters is there is no SinglePartition exchange)
    val sortPlan = df.orderBy(col("k"), col("id")).queryExecution.executedPlan.toString
    assert(sortPlan.contains("rangepartitioning"), sortPlan.take(600))
    assert(!sortPlan.contains("SinglePartition"), sortPlan.take(600))
    assert(ranked.count() === 10000L)
  }

  test("withGlobalRank persists the sorted lineage so the sort runs once (tripwire)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = spark.range(0, 5000).repartition(3).select(col("id"), (col("id") % 13).as("k"))
    val ranked = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")), "rn")
    // zipWithIndex's eager count job + the result map must share ONE
    // materialization of the range-partitioned sort — the persist is
    // registered at build time, so its absence is visible here even
    // before any action runs
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
      "sorted lineage must be persisted across the two rank passes")
    assert(ranked.count() === 5000L)
    // deterministic cleanup: the registry drops exactly what was staged
    assert(GlobalRank.releaseStaged() >= 1)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "releaseStaged must leave no staged sort cached")
  }

  test("releaseStaged leaves no cached RDDs after either two-pass method (census)") {
    val sc = spark.sparkContext
    GlobalRank.releaseStaged() // drain anything staged by earlier tests
    val before = sc.getPersistentRDDs.keySet
    val df = spark.range(0, 3000).repartition(4)
      .select(col("id"), (col("id") % 11).as("k"), (col("id") % 5 + 1).cast("double").as("v"))
    val a = GlobalRank.withGlobalRank(df, Seq(col("k"), col("id")), "rn")
    val b = GlobalRank.withRankAndRunningSum(df, Seq(col("k"), col("id")), col("v"), "rn", "cum")
    a.count(); b.count() // actions complete while staged caches are live
    assert(GlobalRank.stagedCount >= 2)
    assert(GlobalRank.releaseStaged() >= 2)
    assert(GlobalRank.stagedCount === 0)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "no staged sort may remain cached after release")
    // results stay usable after release (recompute path)
    assert(a.count() === 3000L)
  }
}
