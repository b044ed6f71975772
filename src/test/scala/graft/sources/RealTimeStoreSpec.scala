package graft.sources

import graft.SparkTestBase
import graft.query.MachineDetail
import org.apache.spark.sql.functions._

class RealTimeStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def cleanup(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(loc) }
  }

  test("bucketed store: series predicate prunes buckets; condensation matches unbucketed") {
    cleanup("graft_rt_test")
    val rt = Tables.realTime(spark, "/root/testdata/sf0.001")
      .select("id", "messageTimestamp", "value")
    RealTimeStore.write(rt.withColumn("expirationTimestamp", col("messageTimestamp") + 86400L),
      "graft_rt_test", buckets = 8)
    val stored = RealTimeStore.read(spark, "graft_rt_test")

    // bucket pruning on the series key (autoBucketedScan would skip the
    // bucketed read for a filter-only plan — force it for point queries)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val pruned = stored.filter(col("id") === "STATUS_site1/area1/line1/m1")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(600))
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")

    // same condensation result as the unbucketed source
    val a = MachineDetail.realTimeMachineData(stored, "site1/area1/line1/m1",
      1704067200L, 1704070800L).collect().toSeq
    val b = MachineDetail.realTimeMachineData(rt, "site1/area1/line1/m1",
      1704067200L, 1704070800L).collect().toSeq
    assert(a == b && a.nonEmpty)
    spark.sql("DROP TABLE graft_rt_test")
  }

  test("compaction drops expired rows and preserves layout") {
    cleanup("graft_rt_compact", "graft_rt_compact_compacting", "graft_rt_compact_precompact")
    val rows = Seq(
      ("STATUS_m1", 100L, "UP", 1000L),
      ("STATUS_m1", 200L, "DOWN", 99999L),
      ("STATUS_m2", 150L, "UP", 99999L))
      .toDF("id", "messageTimestamp", "value", "expirationTimestamp")
    RealTimeStore.write(rows, "graft_rt_compact", buckets = 4)
    RealTimeStore.compact(spark, "graft_rt_compact", nowEpochS = 5000, buckets = 4)
    val after = RealTimeStore.read(spark, "graft_rt_compact")
    assert(after.count() == 2)
    assert(after.filter(col("messageTimestamp") === 100L).isEmpty)
    // still a bucketed table after compaction
    val desc = spark.sql("DESCRIBE EXTENDED graft_rt_compact").collect().mkString
    assert(desc.contains("Num Buckets") || desc.contains("bucket"), desc.take(400))
    // staging/backup tables are gone after a clean compact
    assert(!spark.catalog.tableExists("graft_rt_compact_compacting"))
    assert(!spark.catalog.tableExists("graft_rt_compact_precompact"))
    spark.sql("DROP TABLE graft_rt_compact")
  }

  test("crash window: staged table present, original still intact and queryable") {
    cleanup("graft_rt_crash", "graft_rt_crash_compacting", "graft_rt_crash_precompact")
    val rows = Seq(
      ("STATUS_m1", 100L, "UP", 1000L),
      ("STATUS_m1", 200L, "DOWN", 99999L))
      .toDF("id", "messageTimestamp", "value", "expirationTimestamp")
    RealTimeStore.write(rows, "graft_rt_crash", buckets = 4)
    // simulate a crash after staging, before the swap
    RealTimeStore.stageCompacted(spark, "graft_rt_crash", nowEpochS = 5000, buckets = 4)
    assert(spark.catalog.tableExists("graft_rt_crash_compacting"))
    // original is untouched — full data, still readable
    assert(RealTimeStore.read(spark, "graft_rt_crash").count() == 2)
    // re-running compact from scratch recovers (stale staging replaced)
    RealTimeStore.compact(spark, "graft_rt_crash", nowEpochS = 5000, buckets = 4)
    assert(RealTimeStore.read(spark, "graft_rt_crash").count() == 1)
    assert(!spark.catalog.tableExists("graft_rt_crash_compacting"))
    spark.sql("DROP TABLE graft_rt_crash")
  }
}
