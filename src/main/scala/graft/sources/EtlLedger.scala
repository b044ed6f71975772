package graft.sources

import graft.model.MessageFormatConfig
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Processed-partition ledger — the engine-side bookkeeping the
 * reference gets from Glue job bookmarks + CRAWL_NEW_FOLDERS_ONLY
 * (SURVEY §4, convert_parquet.py:167,206 / update_crawler.py:31-38):
 * each (year, month, day) raw partition is normalized into the
 * warehouse exactly once; re-running the ETL is a no-op for days
 * already in the ledger.
 *
 * The ledger is committed AFTER the warehouse write — a crash between
 * write and commit replays the day, which is safe because
 * Warehouse.runDailyEtl writes with DYNAMIC partition overwrite: the
 * replay overwrites that day's partitions instead of appending
 * duplicates. This mirrors the reference's bookmark-after-write
 * ordering (job.commit() as the last step).
 */
object EtlLedger {

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def processedDays(spark: SparkSession, ledgerPath: String): Set[(Int, Int, Int)] = {
    val (f, p) = hadoopFs(spark, ledgerPath)
    if (!f.exists(p)) Set.empty
    else spark.read.parquet(ledgerPath)
      .select("year", "month", "day").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
  }

  def commitDay(spark: SparkSession, ledgerPath: String, day: (Int, Int, Int)): Unit = {
    import spark.implicits._
    Seq(day).toDF("year", "month", "day")
      .write.mode(SaveMode.Append).parquet(ledgerPath)
  }

  /** Discover raw-archive days present on storage (any Hadoop-supported
   * filesystem — partition-directory listing, no data read). */
  def availableDays(spark: SparkSession, rawPath: String): Set[(Int, Int, Int)] = {
    val (f, root) = hadoopFs(spark, rawPath)
    if (!f.exists(root)) Set.empty
    else (for {
      y <- f.listStatus(root).toSeq if y.getPath.getName.startsWith("year=")
      m <- f.listStatus(y.getPath).toSeq if m.getPath.getName.startsWith("month=")
      d <- f.listStatus(m.getPath).toSeq if d.getPath.getName.startsWith("day=")
    } yield (
      y.getPath.getName.stripPrefix("year=").toInt,
      m.getPath.getName.stripPrefix("month=").toInt,
      d.getPath.getName.stripPrefix("day=").toInt)).toSet
  }

  /** Run the daily ETL for every unprocessed day, committing the ledger
   * per day. Returns the days processed this run (sorted). */
  def runIncremental(spark: SparkSession, rawPath: String, warehousePath: String,
      ledgerPath: String, formats: Seq[MessageFormatConfig]): Seq[(Int, Int, Int)] = {
    val todo = (availableDays(spark, rawPath) -- processedDays(spark, ledgerPath)).toSeq.sorted
    todo.foreach { case (y, m, d) =>
      Warehouse.runDailyEtl(spark, rawPath, warehousePath, formats, y, m, d)
      commitDay(spark, ledgerPath, (y, m, d))
    }
    todo
  }
}
