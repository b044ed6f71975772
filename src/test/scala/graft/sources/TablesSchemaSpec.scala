package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Schema-drift tripwire (round-7 lesson): the driver regenerates
 * /root/testdata and has shipped `events.ts` as both TIMESTAMP(NANOS)
 * (read as epoch-nanos Long under `nanosAsLong`) and timestamp[us].
 * These tests (a) assert the adapter handles the ACTUAL physical type
 * of every sf directory present, failing with a readable message on a
 * new representation, and (b) pin both adapter branches against
 * in-memory parquet fixtures so either representation keeps working
 * no matter which one the current testdata happens to use.
 */
class TablesSchemaSpec extends SparkTestBase {

  private val NsJan1 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z

  test("every /root/testdata/sf* events.ts physical type is supported by the adapter") {
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf")).map(_.getAbsolutePath).sorted
    assert(dirs.nonEmpty, "no testdata directories found")
    dirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      val dt = ev.schema("ts").dataType
      // throws IllegalStateException with the offending type on drift
      Tables.tsIsTemporal(dt)
      // and the derivations must actually evaluate on a real row
      val row = ev.select(Tables.tsNs(ev).as("ns"), Tables.tsEs(ev).as("es")).head()
      assert(row.getLong(0) / 1000000000L === row.getLong(1),
        s"$dir: tsNs/tsEs disagree for physical type $dt")
    }
  }

  private def writeFixture(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables-schema-fixture").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    df.write.mode("overwrite").parquet(path)
    dir.getAbsolutePath
  }

  private def roundTrip(sfDir: String): Unit = {
    val ev = Tables.events(spark, sfDir)
    val got = ev.orderBy("event_id")
      .select(Tables.tsNs(ev).as("ns"), Tables.tsEs(ev).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      (NsJan1, 1704067200L),
      (NsJan1 + 61500000L * 1000L, 1704067261L)))
    // the telemetry view derives the same instants
    val t = Tables.telemetry(spark, sfDir).orderBy("event_id")
      .select(col("es"), col("ts_us"), col("ts_ns")).head()
    assert(t.getLong(0) === 1704067200L && t.getLong(1) === NsJan1 / 1000L && t.getLong(2) === NsJan1)
    // and the physical passthrough supports a pushable range predicate
    val rt = Tables.realTime(spark, sfDir)
    assert(rt.filter(Tables.tsRawRange(rt, 1704067200L, 1704067201L)).count() === 2L)
  }

  test("adapter Long branch: epoch-nanos BIGINT ts") {
    import spark.implicits._
    val sfDir = writeFixture(Seq(
      (1L, NsJan1, 10L, "error", 0.5),
      (2L, NsJan1 + 61500000L * 1000L, 11L, "purchase", 0.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    roundTrip(sfDir)
  }

  test("adapter temporal branch: timestamp[us] ts (NTZ and instant)") {
    import spark.implicits._
    val base = Seq(
      (1L, NsJan1 / 1000L, 10L, "error", 0.5),
      (2L, NsJan1 / 1000L + 61500000L, 11L, "purchase", 0.25))
      .toDF("event_id", "us", "user_id", "event_type", "value")
    // TIMESTAMP_NTZ — what Spark infers from the driver's timestamp[us]
    roundTrip(writeFixture(base.select(col("event_id"),
      expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"),
      col("user_id"), col("event_type"), col("value"))))
    // TIMESTAMP (instant) — the isAdjustedToUTC variant
    roundTrip(writeFixture(base.select(col("event_id"),
      timestamp_micros(col("us")).as("ts"),
      col("user_id"), col("event_type"), col("value"))))
  }

  test("unsupported ts type fails with a readable message") {
    val e = intercept[IllegalStateException](Tables.tsIsTemporal(StringType))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
