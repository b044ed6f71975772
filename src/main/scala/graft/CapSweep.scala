package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/**
 * Offline measurement harness for the e4/e6 scale lever: the
 * recall-vs-cost curve of `MaxCellPairSide` (the per-subcell cap that
 * bounds the kNN-graph pair space at N×cap instead of Σ|cell|²).
 *
 * For each cap it builds the SAME kNN graph as the e4 query (same
 * cell assignment, same subcell split, same (cosine DESC, dst) rank)
 * and scores edge recall against the UNCAPPED same-cell exact graph,
 * reporting candidate-pair count and wall time alongside — the
 * evidence for choosing the shipped cap (SCALE.md records the curve).
 *
 * Driver-side collects here are measurement-tool-only (truth edge set
 * = N×k rows); nothing in this file is a production operator.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.CapSweep [caps=250,500,1000,2000]
 */
object CapSweep {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val caps = args.headOption.getOrElse("250,500,1000,2000")
      .split(",").map(_.trim.toInt).toSeq
    val k = 3
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sf)
    val centroids = Similarity.fitIvfCentroids(emb)
    val assigned = Similarity.assignCells(emb, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()

    // e4's exact rank formulation over an arbitrary bucket column
    def knn(bucketed: DataFrame, bucket: String): DataFrame = {
      val l = bucketed.select(col(bucket), col("vec_id").as("src"), col("embedding").as("_va"))
      val r = bucketed.select(col(bucket), col("vec_id").as("dst"), col("embedding").as("_vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
      l.join(r, Seq(bucket)).filter(col("src") =!= col("dst"))
        .withColumn("cosine", round(Similarity.cosine(col("_va"), col("_vb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("src"), col("dst"), col("cosine"))
    }

    def pairCount(bucketed: DataFrame, bucket: String): Long =
      bucketed.groupBy(col(bucket)).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1))).head().getLong(0)

    val truthRows = knn(assigned, "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = truthRows.map(t => (t._1, t._2)).toSet
    // per-src WORST true top-k cosine: an edge at/above it is quality-
    // equivalent to a true edge even if tie-breaking picked another id
    // (the exact-clone sf1 regime has massive cosine ties)
    val kthCos: Map[Long, Double] =
      truthRows.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).min }
    println(s"CAPSWEEP sf=$sf vectors=${assigned.count()} truth_edges=${truth.size} " +
      s"uncapped_pairs=${pairCount(assigned, "cell")}")

    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val bounded = Similarity.boundCells(assigned, cap)
      val gotRows = knn(bounded, "subcell").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val sec = (System.nanoTime() - t0) / 1e9
      val got = gotRows.map(t => (t._1, t._2)).toSet
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      val qual = if (truth.isEmpty) 1.0
        else gotRows.count(g => kthCos.get(g._1).exists(g._3 >= _)).toDouble / truth.size
      println(f"CAPSWEEP cap=$cap%5d pairs=${pairCount(bounded, "subcell")}%10d " +
        f"recall=$recall%.4f quality_recall=$qual%.4f wall=$sec%.2f s")
    }
    spark.stop()
  }
}
