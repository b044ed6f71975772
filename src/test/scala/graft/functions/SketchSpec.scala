package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Approximate-aggregate accuracy pins. These operators trade exactness
 * for constant memory at 100 TB (HLL++ registers, quantile sketches,
 * CountMinSketch tables), so they CANNOT be DuckDB-hash-verified like
 * the exact suite — instead each is pinned against its exact
 * counterpart on real test data with its documented error bound.
 * The point: the engine exposes the sketch tier deliberately, with
 * measured error, not as a silent substitute for exact results.
 */
class SketchSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within the configured rsd on real ids") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    // rsd 5% (the default): allow 3 sigma
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.05)).head.getLong(0)
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel <= 0.15, s"approx=$approx exact=$exact rel=$rel")
  }

  test("percentile_approx brackets the exact median of event values") {
    val ev = Tables.events(spark, sf)
    val exact = ev.stat.approxQuantile("value", Array(0.5), 0.0).head // relErr 0 = exact
    val approx = ev.select(percentile_approx(col("value"), lit(0.5), lit(10000)))
      .head.getDouble(0)
    // accuracy 10000 → rank error ≤ n/10000; values are dense in [0, 500]
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("CountMinSketch overestimates-only and is tight on heavy hitters") {
    val docs = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cms = docs.stat.countMinSketch(col("tok"), eps = 0.001, confidence = 0.99, seed = 7)
    val top = docs.groupBy(col("tok")).count()
      .orderBy(col("count").desc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.foreach { case (tok, exact) =>
      val est = cms.estimateCount(tok)
      assert(est >= exact, s"CMS must never undercount: $tok est=$est exact=$exact")
      // eps 0.1% of total stream length bounds the overcount
      assert(est <= exact + (0.001 * cms.totalCount()).toLong + 1,
        s"$tok est=$est exact=$exact total=${cms.totalCount()}")
    }
  }

  test("Bloom sketch has no false negatives and honors the fpp budget") {
    val docs = Tables.documents(spark, sf)
    val evalSide = docs.filter(col("doc_id") % 89 === 0)
    val idx = Dedup.shingleIndex(evalSide, "doc_id", "text", 5)
    val n = idx.select(col("shingle")).distinct().count()
    val bloom = Dedup.bloomOf(idx, col("shingle"), n, fpp = 0.01)
    // every inserted shingle must probe true (no false negatives)
    val misses = idx.filter(!Dedup.bloomMightContain(bloom, col("shingle"))).count()
    assert(misses == 0, s"$misses inserted shingles probed false")
    // disjoint probes: false-positive rate ≈ fpp (generous 5x margin)
    val foreign = Dedup.shingleIndex(
        docs.filter(col("doc_id") % 89 =!= 0), "doc_id", "text", 5)
      .select(col("shingle")).distinct()
      .join(idx.select(col("shingle")).distinct(), Seq("shingle"), "left_anti")
    val fTotal = foreign.count()
    val fHits = foreign.filter(Dedup.bloomMightContain(bloom, col("shingle"))).count()
    assert(fHits.toDouble / fTotal <= 0.05, s"fp rate ${fHits.toDouble / fTotal}")
  }
}
