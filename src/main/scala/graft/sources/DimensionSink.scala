package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Dimension CSV sink (S11) — the machine_information /
 * machine_config_information CSVs the reference's nightly
 * `configuration.py` produces for QuickSight (single-quoted fields,
 * configuration.py:245-308).
 *
 * `coalesce(1)` is intentional: these are dimension files (hundreds of
 * rows), and the reference emits exactly one object per dataset; data
 * tables never go through this sink.
 */
object DimensionSink {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "'")
      .option("quoteAll", "true")
      .csv(path)

  /** The manifest the reference writes next to each CSV
   * (configuration.py:184-202) — here a plain JSON descriptor. */
  def manifestJson(csvUri: String): String =
    s"""{"fileLocations":[{"URIs":["$csvUri"]}],"globalUploadSettings":{"format":"CSV","delimiter":",","textqualifier":"'","containsHeader":"true"}}"""
}
