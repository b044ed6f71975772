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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).count()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
