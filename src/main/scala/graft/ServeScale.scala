package graft

import graft.functions.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Serving-tier scale experiment — ErScale's counterpart for the
 * STANDING-INDEX serve paths: ErScale proved the entity-resolution
 * stack sublinear on an actually-grown keyspace, but nothing yet
 * measured that the fit-once/serve-many paths (r6 bucketed BM25,
 * r9 indexed hybrid, n3 IVF probes) stay flat-to-logarithmic as the
 * CORPUS grows while the query batch is fixed — the property the
 * whole serving design claims at 100 TB ("a query batch costs its
 * matched posting lists / probed cells, independent of index size").
 *
 * Method: replicate documents and embeddings F× with shifted ids
 * (same text/vectors — posting lists and IVF cells grow exactly F×,
 * the adversarial case for a serve path that accidentally scans the
 * index), FIT the standing indexes per factor (timed separately —
 * fits are allowed to grow; they are paid once), then serve the SAME
 * base query batch (ids < n₀, ≡ 0 mod 97) and time it. Three samples
 * per serve path with the Bench cache discipline between samples
 * (each serve call persists its own queries×k result — without the
 * clear, samples 2-3 would time the persisted re-read, not the
 * serve); min reported.
 *
 * What linear growth here would mean, honestly: BM25 serve cost is
 * inherently Ω(matched postings) — replicating every document F×
 * multiplies each query term's posting list by F, so r6/r9 growing
 * ~F× against a 100×-duplicated corpus is the EXPECTED floor, and
 * the instrument's job is to confirm serve cost tracks matched
 * postings (not total index size: terms the queries never use must
 * stay unread behind the bucketed layout). n3's probe cost is
 * nProbe × mean-cell-size: adaptiveCellCount grows the cell COUNT
 * with the corpus to hold cell size near-constant, so n3 is the path
 * expected flat-to-log — a linear n3 curve would be a real finding.
 *
 * Prints one JSON line per factor:
 * {"metric":"serve_scale","factor":F,"docs":N,"vecs":M,"queries":Q,
 *  "fit_bm25_sec":…,"fit_ivf_sec":…,"serve_r6_sec":…,"serve_n3_sec":…,
 *  "serve_r9_sec":…,"r6_rows":…,"n3_rows":…,"r9_rows":…}
 *
 * Usage: runMain graft.ServeScale <sfDir> [factors… default 1 10 100]
 */
object ServeScale {
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

    val baseDocs = sources.Tables.documents(spark, src)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val baseEmb = sources.Tables.embeddings(spark, src)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val n0 = baseDocs.count()
    val m0 = baseEmb.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // min-of-3 with the Bench cache discipline: serve paths persist
    // their own (queries × k) results, so each sample must start from
    // a cold cache or it times the persisted re-read
    def serveMin(body: => Long): (Long, Double) = {
      var rows = 0L
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        graft.functions.GlobalRank.releaseStaged()
        val (r, t) = timed(body)
        rows = r
        t
      }
      (rows, times.min)
    }

    factors.foreach { f =>
      val tmp = sys.props("java.io.tmpdir")
      // F-way replication as ONE explode over the base scan (the
      // ErScale idiom), materialized so fits and serves read a real
      // table
      val docsPath = s"$tmp/graft-servescale-docs-$f"
      baseDocs.select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), lit((f - 1).toLong))).as("_i"))
        .select((col("doc_id") + col("_i") * n0).as("doc_id"), col("text"))
        .write.mode(SaveMode.Overwrite).parquet(docsPath)
      val embPath = s"$tmp/graft-servescale-emb-$f"
      baseEmb.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0L), lit((f - 1).toLong))).as("_i"))
        .select((col("vec_id") + col("_i") * m0).as("vec_id"), col("embedding"))
        .write.mode(SaveMode.Overwrite).parquet(embPath)
      val docs = spark.read.parquet(docsPath)
      val emb = spark.read.parquet(embPath)

      // the FIXED query batch: base-copy ids only, same set every factor
      val queries = Retrieval.selfQueries(
        docs.filter(col("doc_id") < n0), "doc_id", "text")
      val qEmb = emb.filter(col("vec_id") < m0 && col("vec_id") % 97 === 0)
      val qCount = queries.count()

      // fits: timed separately — a standing cluster pays these once
      val ixName = s"graft_servescale_f$f"
      val (_, fitBm25) = timed(
        Retrieval.writeIndexTables(docs, "doc_id", "text", ixName))
      val ivfPath = s"$tmp/graft-servescale-ivf-$f"
      val (_, fitIvf) = timed(
        Similarity.buildIvfIndex(emb, ivfPath))

      // serves: the fixed batch against the grown standing indexes.
      // r6 is measured BOTH unguarded (maxDfFrac = 1.0 — the r-family
      // oracle contract, worst case: a fully-duplicated corpus makes
      // every common term's posting list grow F×) and with the
      // production stop guard (maxDfFrac = 0.5 — terms in > half the
      // corpus are dropped, the lever that bounds matched postings at
      // scale)
      val (r6Rows, r6Sec) = serveMin(
        Retrieval.bm25TopKFromTables(spark, ixName, queries, "query_id",
          "terms", k = 10, maxDfFrac = 1.0).count())
      val (r6gRows, r6gSec) = serveMin(
        Retrieval.bm25TopKFromTables(spark, ixName, queries, "query_id",
          "terms", k = 10, maxDfFrac = 0.5).count())
      val (n3Rows, n3Sec) = serveMin(
        Similarity.ivfTopKIndexed(spark, ivfPath, qEmb, k = 10, nProbe = 4)
          .count())
      val (r9Rows, r9Sec) = serveMin {
        val lex = Retrieval.bm25TopKFromTables(spark, ixName, queries,
          "query_id", "terms", k = 10, maxDfFrac = 1.0)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val dense = Similarity.ivfTopKIndexed(spark, ivfPath, qEmb,
          k = 10, nProbe = 4)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(Seq(lex, dense), k = 10).count()
      }

      println(
        s"""{"metric":"serve_scale","factor":$f,"docs":${n0 * f},""" +
        s""""vecs":${m0 * f},"queries":$qCount,""" +
        s""""fit_bm25_sec":${"%.2f".format(fitBm25)},""" +
        s""""fit_ivf_sec":${"%.2f".format(fitIvf)},""" +
        s""""serve_r6_sec":${"%.2f".format(r6Sec)},""" +
        s""""serve_r6g_sec":${"%.2f".format(r6gSec)},""" +
        s""""serve_n3_sec":${"%.2f".format(n3Sec)},""" +
        s""""serve_r9_sec":${"%.2f".format(r9Sec)},""" +
        s""""r6_rows":$r6Rows,"r6g_rows":$r6gRows,""" +
        s""""n3_rows":$n3Rows,"r9_rows":$r9Rows}""")

      // drop the per-factor index tables so the next factor (and later
      // JVMs over this warehouse) start clean
      Seq("postings", "doclen", "df", "stats").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${ixName}_$t"))
    }
    spark.stop()
  }
}
