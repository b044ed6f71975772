package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic scale-up generator: replicates the driver testdata N× with
 * shifted surrogate keys so correctness and bench runs can be driven
 * at 10× (or more) the graded scale factor.
 *
 * Replication policy (matches the round-2/3 sf1 runs):
 *  - dimensions (region/nation/customer/supplier/part) copy 1× —
 *    facts fan out against the same dimension population;
 *  - orders/lineitem replicate with o_orderkey/l_orderkey shifted in
 *    lockstep (each customer gains N× orders);
 *  - events replicate with shifted event_id and ts bumped +i µs per
 *    copy (same fleet, N× telemetry density, distinct event times);
 *  - documents/embeddings replicate with shifted ids and UNCHANGED
 *    content — every doc becomes an N-way exact-clone cluster, the
 *    adversarial regime for pairwise near-dup (see SCALE.md's
 *    "10× scaling run": it is why dedupPipeline composes exact-first).
 *
 * Usage: runMain graft.MakeScale <srcDir> <dstDir> [factor=10]
 * The events.ts bump adapts to the source's physical representation
 * (epoch-nanos BIGINT under nanosAsLong, or timestamp[us]) and the
 * output round-trips in that same representation — the adapter in
 * [[graft.sources.Tables]] handles either.
 */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val KeyShift = 100000000L // beyond every source key domain

    def rep(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map(i => shift(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[mkscale] $name x$factor")
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[mkscale] $t x1 (dimension)")
    }
    rep("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KeyShift)) }
    rep("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KeyShift)) }
    rep("events") { (df, i) =>
      val bumped = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => col("ts") + lit(i * 1000L) // +i µs in nanos
        case _ => expr(s"timestampadd(MICROSECOND, $i, ts)")
      }
      df.withColumn("event_id", col("event_id") + lit(i * KeyShift))
        .withColumn("ts", bumped) }
    rep("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * KeyShift)) }
    rep("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * KeyShift)) }
    spark.stop()
  }
}
