package graft.api

/**
 * Config hot-reload trigger matrix — the Spark-side decision of when a
 * running ingest must re-resolve its configs, mirroring the
 * reference's DynamoDB-stream-driven invalidation
 * (update-filter-function/index.ts:19-67):
 *
 *  - ConfigTable MESSAGE_FORMAT: ANY write invalidates;
 *  - ConfigTable MACHINE_CONFIG: MODIFY only (inserts are the empty
 *    autocreated rows — nothing to reload);
 *  - UIReference UI_REFERENCE_MAPPING writes and machine NAME changes:
 *    metrics only, no invalidation.
 *
 * In the Spark pipeline configs are re-read per micro-batch anyway
 * (IngestPipeline.runIngest), so Invalidate maps to "must re-read
 * before next batch" for deployments that cache configs across
 * batches.
 */
object ConfigInvalidation {

  sealed trait Decision
  case object Invalidate extends Decision
  case object MetricsOnly extends Decision
  case object Ignore extends Decision

  final case class ChangeEvent(
      table: String, // "CONFIG" | "UI_REFERENCE"
      itemType: String, // MESSAGE_FORMAT | MACHINE_CONFIG | UI_REFERENCE_MAPPING | MACHINE | ...
      eventName: String, // INSERT | MODIFY | REMOVE
      oldName: Option[String] = None,
      newName: Option[String] = None,
      hasNewImage: Boolean = true)

  def decide(e: ChangeEvent): Decision =
    if (!e.hasNewImage) Ignore
    else (e.table, e.itemType) match {
      case ("CONFIG", "MESSAGE_FORMAT") => Invalidate
      case ("CONFIG", "MACHINE_CONFIG") =>
        if (e.eventName.equalsIgnoreCase("MODIFY")) Invalidate else Ignore
      case ("UI_REFERENCE", "UI_REFERENCE_MAPPING") => MetricsOnly
      case ("UI_REFERENCE", "MACHINE") =>
        if (e.oldName.isDefined && e.oldName != e.newName) MetricsOnly else Ignore
      case _ => Ignore
    }

  /** Fold a batch of change events: any Invalidate wins. */
  def decideBatch(events: Seq[ChangeEvent]): Decision = {
    val ds = events.map(decide)
    if (ds.contains(Invalidate)) Invalidate
    else if (ds.contains(MetricsOnly)) MetricsOnly
    else Ignore
  }
}
