package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: `runMain graft.Probe q1 q2 ...`
  * runs the named queries in argument order on SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints one PROBE line each — for isolating
  * whether a slow bench query is inherently slow or polluted by
  * session state accumulated from earlier queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches Bench's cpus so PROBE times are comparable to
    // the bench artifact; SPARK_GRAFT_CPUS=32 for scale-shape checks
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).count()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same per-query isolation as Bench: operator-owned persists and
      // staged rank RDDs must not leak into the next measurement
      spark.catalog.clearCache()
      graft.functions.GlobalRank.releaseStaged()
    }
    spark.stop()
  }
}
