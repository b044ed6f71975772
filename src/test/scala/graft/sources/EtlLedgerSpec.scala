package graft.sources

import graft.SparkTestBase
import graft.model.MessageFormatConfig
import java.nio.file.Files

class EtlLedgerSpec extends SparkTestBase {
  import spark.implicits._

  test("incremental ETL processes each day exactly once") {
    val dir = Files.createTempDirectory("graft-ledger").toString
    val goodTs1 = "2021-03-05 10:00:00.000000+00:00" // epoch 1614938400
    val goodTs2 = "2021-03-06 10:00:00.000000+00:00"
    def payload(ts: String): String = {
      val json = s"""{"messages":[{"name":"a/b/status","quality":"GOOD","timestamp":"$ts","value":"u"}]}"""
      java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
    }
    Warehouse.archiveRaw(
      Seq((payload(goodTs1), 1614938400L), (payload(goodTs2), 1615024800L))
        .toDF("payload", "epoch_s"),
      "payload", "epoch_s", s"$dir/raw")

    val formats = Seq(MessageFormatConfig(id = "DEFAULT"))
    val first = EtlLedger.runIncremental(spark, s"$dir/raw", s"$dir/wh", s"$dir/ledger", formats)
    assert(first == Seq((2021, 3, 5), (2021, 3, 6)))
    assert(spark.read.parquet(s"$dir/wh").count() == 2)

    // second run: nothing new, warehouse unchanged
    val second = EtlLedger.runIncremental(spark, s"$dir/raw", s"$dir/wh", s"$dir/ledger", formats)
    assert(second.isEmpty)
    assert(spark.read.parquet(s"$dir/wh").count() == 2)

    // a new day arrives: only that day is processed
    Warehouse.archiveRaw(
      Seq((payload("2021-03-07 10:00:00.000000+00:00"), 1615111200L)).toDF("payload", "epoch_s"),
      "payload", "epoch_s", s"$dir/raw")
    val third = EtlLedger.runIncremental(spark, s"$dir/raw", s"$dir/wh", s"$dir/ledger", formats)
    assert(third == Seq((2021, 3, 7)))
    assert(spark.read.parquet(s"$dir/wh").count() == 3)
  }

  test("crash replay of a day overwrites its partition, never duplicates") {
    val dir = Files.createTempDirectory("graft-ledger-replay").toString
    def payload(ts: String): String = {
      val json = s"""{"messages":[{"name":"a/b/status","quality":"GOOD","timestamp":"$ts","value":"u"}]}"""
      java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
    }
    Warehouse.archiveRaw(
      Seq((payload("2021-03-05 10:00:00.000000+00:00"), 1614938400L),
        (payload("2021-03-05 11:00:00.000000+00:00"), 1614942000L))
        .toDF("payload", "epoch_s"),
      "payload", "epoch_s", s"$dir/raw")
    val formats = Seq(MessageFormatConfig(id = "DEFAULT"))
    // simulate "wrote the warehouse, crashed before commitDay": run the
    // day ETL directly (no ledger), then the incremental orchestrator
    // replays it because the ledger never recorded it
    assert(Warehouse.runDailyEtl(spark, s"$dir/raw", s"$dir/wh", formats, 2021, 3, 5) == 2L)
    val replayed = EtlLedger.runIncremental(spark, s"$dir/raw", s"$dir/wh", s"$dir/ledger", formats)
    assert(replayed == Seq((2021, 3, 5)))
    // dynamic partition overwrite: still exactly 2 rows, not 4
    assert(spark.read.parquet(s"$dir/wh").count() == 2)
  }
}
