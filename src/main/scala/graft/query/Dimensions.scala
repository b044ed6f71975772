package graft.query

import graft.model.UiReferenceMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dimension builders — the Spark re-expression of the nightly
 * `configuration.py` ETL (glue-job-scripts/configuration.py).
 *
 * The reference derives the location→line→machine hierarchy by
 * splitting the machine id on the alias delimiter and selecting token
 * positions named by the UI_REFERENCE_MAPPING config
 * (configuration.py:205-220, Overview.tsx:221-248, defaults '0/1' and
 * '2' — solution-helper-construct.ts:150-153).
 */
object Dimensions {

  private def quoted(d: String) = java.util.regex.Pattern.quote(d)

  /** Join the id tokens at the (0-based) positions listed in `keys`.
   * The POSITION LIST always splits on '/' — the reference's batch side
   * does (configuration.py:251,255) regardless of the alias delimiter,
   * which only splits the id itself (:261). Out-of-range positions are
   * skipped (:217 — `try_element_at` null + concat_ws null-skip). */
  def tokensAt(id: Column, delim: String, keys: String): Column = {
    val positions = keys.split("/").filter(_.trim.nonEmpty).map(_.trim.toInt)
    val toks = split(id, quoted(delim))
    concat_ws(delim, positions.map(p => try_element_at(toks, lit(p + 1))): _*)
  }

  /**
   * machine_information (configuration.py:245-264): one row per machine
   * with derived location and line; `machine_name` falls back to the id
   * when unset (:259).
   *
   * `machines` columns: id, name (nullable).
   */
  def machineInformation(machines: DataFrame, delim: String = "/",
      mapping: UiReferenceMapping = UiReferenceMapping()): DataFrame =
    machines.select(
      col("id"),
      coalesce(col("name"), col("id")).as("machine_name"),
      tokensAt(col("id"), delim, mapping.locationKeys).as("location"),
      tokensAt(col("id"), delim, mapping.lineKeys).as("line"))

  /**
   * machine_config_information (configuration.py:286-294): the
   * down-value DECODE table — one row per comma-separated down value,
   * values trimmed. Turns the CSV-membership predicate into an
   * equi-join key (see Downtime.downtimeSegments).
   *
   * `machineConfigs` columns: machineId, statusTag, statusDownValues.
   */
  def machineConfigInformation(machineConfigs: DataFrame): DataFrame =
    machineConfigs
      .filter(col("statusTag").isNotNull && col("statusDownValues").isNotNull)
      .select(
        col("machineId").as("id"),
        col("statusTag").as("status_tag"),
        explode(transform(split(col("statusDownValues"), ","), trim(_))).as("down_value"))
}
