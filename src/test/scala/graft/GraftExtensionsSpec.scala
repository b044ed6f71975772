package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkTestBase {

  test("float_vec_dot is SQL-callable after registration") {
    GraftExtensions.registerTemp(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("text-analysis surface is SQL-callable and matches the Column API") {
    GraftExtensions.registerTemp(spark)
    val text = "the quick brown fox jumps over the lazy dog and the cat"
    val sqlRow = spark.sql(
      s"""SELECT graft_token_count('$text') AS tc,
         |  graft_bpeish_token_count('$text') AS bc,
         |  graft_quality_score('$text') AS q,
         |  graft_lang_id('$text') AS lang,
         |  graft_repetition_ratio('$text') AS rep,
         |  graft_fingerprint('$text') AS fp,
         |  graft_redact_pii('mail a@b.co or 555-123-4567') AS red,
         |  graft_hash32('k1') AS h,
         |  size(graft_shingles('$text', 5)) AS nsh""".stripMargin).head()
    val colRow = spark.range(1).select(
      TextAnalysis.tokenCount(lit(text)),
      TextAnalysis.bpeishTokenCount(lit(text)),
      TextAnalysis.qualityScore(lit(text)),
      TextAnalysis.languageId(lit(text)),
      TextAnalysis.repetitionRatio(lit(text)),
      TextAnalysis.fingerprint(lit(text)),
      TextAnalysis.redactPii(lit("mail a@b.co or 555-123-4567")),
      graft.functions.Dedup.md5Hash32(lit("k1")),
      size(graft.functions.Dedup.shingles(lit(text), 5))).head()
    assert(sqlRow.toSeq == colRow.toSeq)
    assert(sqlRow.getAs[String]("lang") == "en")
    assert(sqlRow.getAs[String]("red") == "mail <EMAIL> or <PHONE>")
  }

  test("graft_quality_logit and graft_rand_proj are SQL-callable and match the Column API") {
    GraftExtensions.registerTemp(spark)
    val text = "the quick brown fox jumps over the lazy dog"
    val sqlRow = spark.sql(
      s"""SELECT graft_quality_logit('$text') AS logit,
         |  graft_rand_proj(array(${(1 to 64).map(i => s"cast(0.$i as float)").mkString(", ")})) AS p
         |""".stripMargin).head()
    val colRow = spark.range(1).select(
      TextAnalysis.qualityLogit(lit(text)),
      graft.functions.Similarity.randomProject(
        typedLit((1 to 64).map(i => s"0.$i".toFloat)), 64, 16)).head()
    assert(sqlRow.toSeq == colRow.toSeq)
    assert(sqlRow.getSeq[Float](1).size == 16)
  }

  test("graft_cosine in SQL over a real table matches Similarity.cosine") {
    GraftExtensions.registerTemp(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(8)
    emb.createOrReplaceTempView("emb_ext_spec")
    val viaSql = spark.sql(
      """SELECT a.vec_id, round(graft_cosine(a.embedding, b.embedding), 6) AS c
        |FROM emb_ext_spec a JOIN emb_ext_spec b ON b.vec_id = 0
        |ORDER BY a.vec_id""".stripMargin).collect()
    val viaCol = emb.as("a")
      .join(emb.as("b").filter(col("vec_id") === 0)
        .select(col("embedding").as("b_emb")))
      .select(col("vec_id"),
        round(graft.functions.Similarity.cosine(col("embedding"), col("b_emb")), 6).as("c"))
      .orderBy("vec_id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
  }

  test("graft_shingles requires a literal n") {
    GraftExtensions.registerTemp(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', cast(rand()*3 as int))").head()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("graft_zorder in SQL matches ZOrder.key and requires literal bits") {
    GraftExtensions.registerTemp(spark)
    val rows = spark.sql(
      """SELECT graft_zorder(4, CAST(x AS BIGINT), CAST(y AS BIGINT)) AS z, x, y
        |FROM VALUES (3, 5), (0, 15), (9, 9) AS t(x, y)""".stripMargin)
      .select("z", "x", "y").collect()
    rows.foreach { r =>
      val (z, x, y) = (r.getLong(0), r.getInt(1).toLong, r.getInt(2).toLong)
      var exp = 0L
      for (j <- 0 until 4) {
        exp |= ((x >>> j) & 1L) << (2 * j)
        exp |= ((y >>> j) & 1L) << (2 * j + 1)
      }
      assert(z === exp, s"($x,$y)")
    }
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zorder(cast(rand()*3 as int), 1L, 2L)").head()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("graft_hll_* SQL aggregates: two-level sketch/merge matches the Column API") {
    GraftExtensions.registerTemp(spark)
    spark.range(0, 4000)
      .select(concat(lit("u"), col("id") % 350).as("v"), (col("id") % 5).as("shard"))
      .createOrReplaceTempView("hll_in")
    val sqlEst = spark.sql(
      """SELECT graft_hll_stats(graft_hll_merge(sk)).estimate AS est
        |FROM (SELECT shard, graft_hll_sketch(v) AS sk FROM hll_in GROUP BY shard)""".stripMargin)
      .head().getDouble(0)
    val colEst = spark.table("hll_in")
      .agg(graft.functions.Hll.sketch(col("v")).as("sk"))
      .select(graft.functions.Hll.stats(col("sk")).getField("estimate"))
      .head().getDouble(0)
    assert(sqlEst === colEst)
    assert(math.abs(sqlEst - 350.0) / 350.0 < 0.13)
  }
}
