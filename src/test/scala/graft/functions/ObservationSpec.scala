package graft.functions

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/**
 * Pipeline telemetry via Spark's Observation API: data-quality
 * counters ride the SAME pass as the query (accumulator-backed), so
 * an ETL job reports rows/reject/domain metrics with ZERO extra scans
 * — at 100 TB a second "count the bad rows" pass is a second 100 TB
 * read. The reference logs these per Lambda batch
 * (filter-kinesis-stream/index.ts); here they attach to any plan.
 */
class ObservationSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("quality counters ride the ETL pass — one action, exact values") {
    val obs = Observation("etl_quality")
    val t = Tables.telemetry(spark, sf)
    val observed = t.observe(obs,
      count(lit(1)).as("rows"),
      count_if(col("status") === "DOWN").as("down_rows"),
      count_if(col("quality") =!= "GOOD").as("bad_quality"),
      max(col("es")).as("max_event_s"))
    val n = observed.filter(col("status").isNotNull).count() // the ONE action
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] >= n)
    // cross-check against direct aggregation
    val direct = t.agg(
      count_if(col("status") === "DOWN"), count_if(col("quality") =!= "GOOD"),
      max(col("es"))).head
    assert(m("down_rows") == direct.getLong(0))
    assert(m("bad_quality") == direct.getLong(1))
    assert(m("max_event_s") == direct.getLong(2))
  }
}
