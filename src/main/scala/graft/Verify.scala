package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. An optional
  * third arg (comma-list of query names) restricts the dump — targeted
  * re-validation after a single-query fix; the driver never passes it. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts has shipped as TIMESTAMP(NANOS) (needs the Long
      // reader representation) and as timestamp[us]; Tables branches
      // on the actual physical type, this flag only enables the nanos
      // branch to load at all.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ANSI pinned ON explicitly (the Spark 4 default) — every
      // correctness dump runs under ANSI semantics; the env override
      // exists only for parity experiments
      .config("spark.sql.ansi.enabled", sys.env.getOrElse("SPARK_GRAFT_ANSI", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // Each query is an independent pipeline; the composed dedup/ANN
        // operators return caller-owned persisted results (Dedup
        // .ownStages contract) that a map-driven harness can't
        // individually release — drop them per query, as Bench does,
        // so caches never accumulate across the 91-query pass.
        // clearCache only sees catalog-level caches; GlobalRank stages
        // an RDD-level persist per call — release those too.
        spark.catalog.clearCache()
        graft.functions.GlobalRank.releaseStaged()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static oracles + generated ones (fitted constants, e.g. n3's
    // KMeans centroids — deterministic refit against this sf dir)
    val allOracles = SparkEntry.oracleSql ++
      (try SparkEntry.dynamicOracleSql(spark, sfDir)
       catch { case e: Throwable =>
         System.err.println(s"[verify] dynamic oracle generation failed: ${e.getMessage}")
         Map.empty[String, String] })
    val json = allOracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
