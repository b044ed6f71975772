package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusExportSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = (1 to n).map { i =>
    (i.toLong, s"s${i % 2}", s"doc $i body ${"tok " * (i % 23)}")
  }.toDF("doc_id", "source", "text")

  test("export: every doc exactly once, budget respected, manifest matches read-back") {
    val dir = Files.createTempDirectory("corpus-export").toString
    val budget = 64L
    val docs = corpus(200)
    val m = CorpusExport.exportJsonl(docs, "doc_id", "source", "text",
      dir, tokensPerShard = budget, batchCol = "doc_id")

    assert(new java.io.File(s"$dir/_SUCCESS").exists())
    val back = spark.read.json(s"$dir/data")
    // lossless: every doc id exactly once, text intact
    assert(back.count() === 200)
    assert(back.select("doc_id").distinct().count() === 200)
    val origText = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    back.select("doc_id", "text").as[(Long, String)].collect()
      .foreach { case (id, t) => assert(t === origText(id), s"doc $id text") }

    // manifest counts equal the data actually on disk, per (source, shard)
    val diskCounts = back.groupBy("source", "shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tk"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, sh, n, tk) => (s, sh) -> (n, tk) }.toMap
    val manifestRows = m.as[(String, Long, Long, Long, String)].collect()
    assert(manifestRows.map(r => (r._1, r._2)).toSet === diskCounts.keySet)
    manifestRows.foreach { case (s, sh, nDocs, nTokens, _) =>
      assert(diskCounts((s, sh)) === ((nDocs, nTokens)), s"manifest vs disk for ($s, $sh)")
    }
    // token budget: a shard exceeds it only via its LAST doc (packing
    // closes a shard when the cumulative position crosses the budget)
    manifestRows.foreach { case (s, sh, _, nTokens, _) =>
      val maxDoc = back.filter(col("source") === s && col("shard") === sh)
        .agg(max("n_tokens")).as[Long].head()
      assert(nTokens <= budget + maxDoc, s"shard ($s, $sh) blew the budget")
    }
  }

  test("re-export is bit-deterministic: same shards, same checksums") {
    val d1 = Files.createTempDirectory("corpus-export-a").toString
    val d2 = Files.createTempDirectory("corpus-export-b").toString
    val docs = corpus(120)
    def run(dir: String) = CorpusExport.exportJsonl(docs.repartition(7), "doc_id",
      "source", "text", dir, tokensPerShard = 50L, batchCol = "doc_id")
      .as[(String, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(d1) === run(d2), "manifest (incl. checksums) must be deterministic")
    // and a re-export over a PARTIAL previous attempt converges
    val stale = new java.io.File(s"$d1/_SUCCESS"); stale.delete()
    assert(run(d1) === run(d2))
  }

  test("checksum catches content drift") {
    val dir = Files.createTempDirectory("corpus-export-c").toString
    val m1 = CorpusExport.exportJsonl(corpus(50), "doc_id", "source", "text",
      dir, 50L, "doc_id").as[(String, Long, Long, Long, String)].collect()
    val tampered = corpus(50).withColumn("doc_id",
      when(col("doc_id") === 7L, 999L).otherwise(col("doc_id")))
    val m2 = CorpusExport.exportJsonl(tampered, "doc_id", "source", "text",
      dir + "-t", 50L, "doc_id").as[(String, Long, Long, Long, String)].collect()
    val c1 = m1.map(r => (r._1, r._2) -> r._5).toMap
    val c2 = m2.map(r => (r._1, r._2) -> r._5).toMap
    assert(c1 !== c2, "id checksum must change when membership changes")
  }
}
