package graft

import graft.functions.{Dedup, FuzzyJoin}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Entity-resolution scale experiment: the ER family's bench evidence
 * at sf1 is trivially flat because [[MakeScale]] copies dimensions 1×
 * — customer (the ER input) is IDENTICAL at sf0.1 and sf1. This main
 * grows the actual ER workload: replicate customers F× with shifted
 * keys and REGENERATED serial names (`Customer#%09d` of the shifted
 * key — the same format, so the edit-distance structure stays
 * realistic: new one-digit-variant links appear between copies and
 * chains lengthen, the adversarial topology SCALE.md documents), then
 * time the three ER stages on the materialized table:
 *
 *  - pairs: FastSS deletion-neighborhood join + thresholded verify
 *    (the d19 candidate/verify core);
 *  - closure: nation-agreement gate + star connected components to
 *    entity labels (the d20 composition);
 *  - snm: 3-pass sorted-neighborhood union (the d22 cheap generator).
 *
 * Prints one JSON line per factor:
 * {"metric":"er_scale","factor":F,"names":N,"pairs":P,
 *  "pairs_sec":…,"cc_sec":…,"snm_sec":…,"entities":E,"max_cluster":M}
 *
 * Usage: runMain graft.ErScale <sfDir> [factors… default 1 10 100]
 */
object ErScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = sources.Tables.customer(spark, src)
      .select(col("c_custkey").cast("long").as("k"), col("c_nationkey"))
    val n0 = base.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    factors.foreach { f =>
      val path = s"${sys.props("java.io.tmpdir")}/graft-erscale-$f"
      // materialize so the timed stages read a real table, not an
      // in-memory union; the F-way replication is an explode over one
      // base scan, not an F-leaf union re-reading the source F times
      base.select(col("k"), col("c_nationkey"),
          explode(sequence(lit(0L), lit((f - 1).toLong))).as("_i"))
        .select(format_string("Customer#%09d", col("k") + col("_i") * n0)
            .as("c_name"),
          col("c_nationkey"))
        .write.mode(SaveMode.Overwrite).parquet(path)
      val cust = spark.read.parquet(path)
      val names = n0 * f

      // stage 1 — FastSS candidate join + verify, timed alone; the
      // verified pairs are WRITTEN so stage 2 times the gate+closure
      // only (not a second pair build — the stages must be disjoint
      // for the published table to add up)
      val pairsPath = s"$path-pairs"
      val (pairCount, pairsSec) = timed {
        FuzzyJoin.editDistance1Pairs(cust.select(col("c_name")), "c_name")
          .write.mode(SaveMode.Overwrite).parquet(pairsPath)
        spark.read.parquet(pairsPath).count()
      }

      // stage 2 — agreement gate + star closure over the materialized
      // pairs; entities use the d20 semantics (every name labeled,
      // singletons are their own entity)
      val ((entities, maxCluster), ccSec) = timed {
        val pairs = spark.read.parquet(pairsPath)
        val a = cust.select(col("c_name").as("left_str"),
          col("c_nationkey").as("_na"))
        val b = cust.select(col("c_name").as("right_str"),
          col("c_nationkey").as("_nb"))
        val edges = pairs
          .join(a, Seq("left_str")).join(b, Seq("right_str"))
          .filter(col("_na") === col("_nb"))
          .select(col("left_str"), col("right_str"))
        val lab = Dedup.connectedComponentsStar(edges, "left_str", "right_str")
        val agg = lab.groupBy(col("component")).agg(count(lit(1)).as("m"))
          .agg(count(lit(1)).as("c"), max(col("m")).as("mx"),
            sum(col("m")).as("linked")).head()
        // zero verified pairs ⇒ lab is empty and max/sum aggregate to
        // NULL — every name is its own singleton entity
        val (linkedComponents, mx, linkedNames) =
          if (agg.isNullAt(1)) (0L, 1L, 0L)
          else (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        (linkedComponents + (names - linkedNames), mx)
      }

      val (snmCount, snmSec) = timed {
        val c = FuzzyJoin.multiPassSnmPairs(cust.select(col("c_name")), "c_name")
          .count()
        // GlobalRank's caller contract: release the staged sorted
        // lineages (3 passes persist 3) before the next factor runs
        graft.functions.GlobalRank.releaseStaged()
        c
      }
      println(
        s"""{"metric":"er_scale","factor":$f,"names":$names,""" +
        s""""pairs":$pairCount,"pairs_sec":${"%.2f".format(pairsSec)},""" +
        s""""cc_sec":${"%.2f".format(ccSec)},"snm_sec":${"%.2f".format(snmSec)},""" +
        s""""entities":$entities,"max_cluster":$maxCluster,"snm_pairs":$snmCount}""")
    }
    spark.stop()
  }
}
