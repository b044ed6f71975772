package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: `runMain graft.Explain <q1,q2,...|all> [sfDir]`
  * prints the formatted physical plan of each named query (comma
  * separated; `all` iterates every query) — the .explain("formatted")
  * loop the build process uses to keep plans honest between rounds. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name == "all") SparkEntry.queries.keys.toSeq.sorted
      else name.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    targets.foreach { q =>
      println(s"\n=== $q ===")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
