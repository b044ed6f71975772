package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: orthogonal 0, identical 1, scaled invariant") {
    val df = Seq((
      Seq(1f, 0f), Seq(0f, 1f), Seq(2f, 0f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("a")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(r.getDouble(0) == 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L)) // 0.995 > 0 > -1
  }

  test("LSH top-k results are a subset of brute-force with matching ranks for found items") {
    val vecs = (0L until 50L).map { i =>
      (i, Seq.tabulate(16)(d => math.sin(i * 31 + d * 7).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, 5, dim = 16, planes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // LSH returns bucket-mates only; every query finds at least itself-adjacent items
    assert(lsh.nonEmpty)
    // identical vector (the query itself is excluded) — recall sanity:
    // every LSH hit must share the query's bucket, so no false results
    // beyond cosine ordering; spot check rank-1 of query 0 matches when present
    val bfTop = bf // brute force is ground truth
    assert(lsh.intersect(bfTop).size >= lsh.size / 2)
  }

  test("multi-probe LSH raises recall vs single-bucket probing") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(multi: Boolean): Double = {
      val hits = Similarity.lshTopK(emb, queries, 5, dim = 64, planes = 6, multiProbe = multi)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      hits.intersect(bf).size.toDouble / bf.size
    }
    val single = recall(multi = false)
    val multi = recall(multi = true)
    assert(multi >= single, s"multi-probe $multi < single $single")
    assert(multi > 0.2, s"multi-probe recall $multi")
  }

  test("IVF top-k: high recall vs brute force at nProbe=4/16 on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nClusters = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.size == bf.size) // k filled for every query
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.4, s"IVF recall $recall") // random vectors: probing half the cells
  }

  test("adaptiveCellCount: floor 16, grows ~N/target, capped at 1024") {
    assert(Similarity.adaptiveCellCount(0L) == 16)
    assert(Similarity.adaptiveCellCount(500L) == 16)
    assert(Similarity.adaptiveCellCount(65536L) == 16)
    assert(Similarity.adaptiveCellCount(100L * 4096L) == 100)
    assert(Similarity.adaptiveCellCount(100_000_000L) == 1024) // literal-argmin cap
  }

  test("margin probe: home rows match assignCells, ghosts only near boundaries") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.fitIvfCentroids(emb, nClusters = 8)
    val plain = Similarity.assignCells(emb, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val exp = Similarity.assignCellsWithMargin(emb, cents, margin = 0.05)
      .select("vec_id", "home_cell", "cell").as[(Long, Int, Int)].collect()
    // home rows reproduce the plain assignment exactly
    val homes = exp.filter(r => r._3 == r._2).map(r => r._1 -> r._2).toMap
    assert(homes == plain)
    // ghosts exist but only for a strict subset (boundary fraction)
    val ghosts = exp.filter(r => r._3 != r._2)
    assert(ghosts.nonEmpty, "margin 0.05 should ghost some boundary vectors")
    assert(ghosts.length < plain.size, "not every vector may ghost")
    assert(ghosts.forall(g => g._3 != plain(g._1))) // ghost cell differs from home
    // at most one ghost per vector (top-2 probe)
    assert(ghosts.groupBy(_._1).forall(_._2.length == 1))
    // a negative margin disables ghosting entirely
    val none = Similarity.assignCellsWithMargin(emb, cents, margin = -1.0)
    assert(none.count() == plain.size)
  }

  test("boundCells bounds the per-cell pair space; inert below the cap") {
    // adversarial: ALL vectors in one KMeans cell (identical embedding),
    // ids all even so a raw-id modulus would NOT split them — the md5
    // hash must
    val one = Seq(1f, 0f)
    val df = (0L until 500L).map(i => (i * 2, one)).toDF("vec_id", "embedding")
      .withColumn("cell", lit(0))
    val cap = 50
    val sizes = Similarity.boundCells(df, cap)
      .groupBy("subcell").count().as[(String, Long)].collect()
    assert(sizes.length == 10) // ceil(500/50) sub-cells, all non-empty
    val maxSub = sizes.map(_._2).max
    assert(maxSub <= 2L * cap, s"hash split left a $maxSub-row sub-cell")
    // pair space: Σ|subcell|² vs the unguarded 500²
    val pairSpace = sizes.map(s => s._2 * s._2).sum
    assert(pairSpace <= 500L * 500L / 5, s"pair space $pairSpace not bounded")
    // inert below the cap: subcell degenerates to the cell itself
    val inert = Similarity.boundCells(df, 1000)
      .select("subcell").distinct().as[String].collect().toSeq
    assert(inert == Seq("0_0"))
  }

  test("margin-expanded cells respect the boundCells cap (e5/e6 pair-space guard)") {
    // adversarial mode-skew: every vector sits on the boundary between
    // two near-identical centroids, so margin probing ghosts ALL of
    // them into BOTH cells — each expanded cell is the whole corpus.
    // The cap must still split the expanded assignment into bounded
    // sub-cells; without it the pair space is the full |corpus|².
    val cents = Seq(0 -> Seq(1f, 0.001f), 1 -> Seq(1f, -0.001f))
    val emb = (0L until 400L).map(i => (i, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val exp = Similarity.assignCellsWithMargin(emb, cents, margin = 0.05)
    assert(exp.count() == 800) // every vector ghosted into the other cell
    val cap = 50
    val sizes = Similarity.boundCells(exp, cap)
      .groupBy("subcell").count().as[(String, Long)].collect()
    val maxSub = sizes.map(_._2).max
    assert(maxSub <= 2L * cap, s"expanded-cell hash split left a $maxSub-row sub-cell")
    val pairSpace = sizes.map(s => s._2 * s._2).sum
    assert(pairSpace <= 800L * 800L / 5, s"xcell pair space $pairSpace not bounded")
    // home rows survive the cap unchanged: one per vector, cell == home
    val homes = Similarity.boundCells(exp, cap)
      .filter(col("cell") === col("home_cell")).select("vec_id").distinct().count()
    assert(homes == 400)
  }

  test("int8 quantization: values bounded, reconstruction preserves direction") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Similarity.quantizeInt8(emb, "embedding")
      .withColumn("recon", Similarity.dequantizeInt8(col("qvec"), col("scale")))
      .withColumn("cos", Similarity.cosine(col("embedding"), col("recon")))
      .withColumn("qmax", array_max(transform(col("qvec"), x => abs(x))))
    val (minCos, maxQ) = q.agg(min(col("cos")), max(col("qmax")))
      .as[(Double, Int)].head()
    assert(maxQ <= 127)
    assert(minCos >= 0.995, s"min reconstruction cosine $minCos") // ~8-bit error on 64 dims
    // zero vector: scale 0, all-zero qvec, no NaN
    val z = Similarity.quantizeInt8(
      Seq((0L, Seq.fill(4)(0f))).toDF("vec_id", "embedding"), "embedding")
      .select("scale", "qvec").as[(Double, Seq[Int])].head()
    assert(z == ((0.0, Seq(0, 0, 0, 0))))
  }

  test("quantized two-stage ANN: high recall vs brute force, exact rescored cosines") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val qz = Similarity.quantizedTopK(emb, queries, 10)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(qz.length == bf.length) // k filled for every query
    // int8 on 64 dims is a fine-grained proxy: the rescored top-10
    // should recover nearly all of the exact top-10
    val recall = qz.map(r => (r._1, r._2)).toSet
      .intersect(bf.map(r => (r._1, r._2)).toSet).size.toDouble / bf.length
    assert(recall >= 0.8, s"quantized recall $recall")
    // rescoring is EXACT: shared pairs carry identical cosines
    val bfCos = bf.map(r => (r._1, r._2) -> r._3).toMap
    qz.foreach { case (q, n, c) =>
      bfCos.get((q, n)).foreach(e => assert(e == c, s"rescored cosine mismatch ($q,$n)")) }
  }

  test("persisted IVF index: serving matches in-memory search and prunes cell partitions") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.buildIvfIndex(emb, path, nClusters = 8)

    val centroids = Similarity.loadIvfCentroids(spark, path)
    assert(centroids.map(_._1) == (0 until 8))
    val direct = Similarity.ivfTopKWith(emb, queries, 5, centroids, nProbe = 3)
      .collect().map(_.toSeq).toSet
    val served = Similarity.ivfTopKIndexed(spark, path, queries, 5, nProbe = 3)
    assert(served.collect().map(_.toSeq).toSet == direct)

    // the corpus scan reads only the probed cell partitions
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(900))
    // a single query probing 2 of 8 cells genuinely prunes the scan
    val oneQuery = emb.filter(col("vec_id") === 0)
    val probed = Similarity.probeCells(oneQuery, centroids, nProbe = 2)
      .select("cell").distinct().count()
    assert(probed == 2, s"probed $probed cells")
  }

  test("filtered ANN: predicate composes with cell pruning, k stays full, results match a filtered corpus") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-filt").toString
    Similarity.buildIvfIndex(emb, path, nClusters = 8, metaCols = Seq("label"))
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val pred = col("label").isin(1, 3, 5, 7, 9)

    val served = Similarity.ivfTopKIndexed(spark, path, queries, k = 5,
      nProbe = 3, pred = Some(pred))
    // identical to searching the pre-filtered corpus with the SAME
    // (full-corpus) centroids — filter must not change the quantizer
    val direct = Similarity.ivfTopKWith(emb.filter(pred), queries, 5, centroids, nProbe = 3)
      .collect().map(_.toSeq).toSet
    assert(served.collect().map(_.toSeq).toSet == direct)
    // every neighbor satisfies the predicate, k filled per query
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val rows = served.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    rows.foreach { case (_, n) => assert(labels(n) % 2 == 1, s"neighbor $n fails pred") }
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
    // the predicate reaches the pruned scan as a pushed filter
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(900))
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("label")), plan.take(1200))
  }

  test("IVF-SQ8: quantized probe + exact rerank matches full-precision IVF within probed cells") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfsq8").toString
    Similarity.buildIvfSq8Index(emb, path, nClusters = 8)

    val served = Similarity.ivfQuantizedTopK(spark, path, queries, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(served.map(_._1).distinct.length == 5)
    assert(served.groupBy(_._1).forall(_._2.length == 5)) // k filled per query

    // exact-rerank contract: every reported cosine equals the
    // full-precision IVF cosine for the same pair (same probe set)
    val full = Similarity.ivfTopKIndexed(spark,
      { val p = java.nio.file.Files.createTempDirectory("graft-ivf-ref").toString
        Similarity.buildIvfIndex(emb, p, nClusters = 8); p },
      queries, k = 30, nProbe = 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    served.foreach { case (q, n, c) =>
      full.get((q, n)).foreach(e => assert(e == c, s"cosine mismatch ($q,$n)")) }
    // int8 stage-1 on 64 dims: near-total agreement with the exact
    // top-5 within the same probed cells
    val fullTop5 = Similarity.ivfQuantizedTopK(spark, path, queries, k = 5,
      nProbe = 3, rerankFactor = 6).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = served.map(r => (r._1, r._2)).count(fullTop5.contains) / served.length.toDouble
    assert(recall >= 0.8, s"sq8 recall vs wider rerank $recall")

    // the quantized table is the one partition-pruned at probe time
    val plan = Similarity.ivfQuantizedTopK(spark, path, queries, k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("qcorpus"), plan.take(1200))
  }

  test("IVF-PQ: probe-pruned code scan, exact rerank, codes partitioned by cell") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.buildIvfPqIndex(emb, path, dim = 64, nClusters = 8)

    val served = Similarity.ivfPqTopK(spark, path, queries, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(served.map(_._1).distinct.length == 5)
    assert(served.groupBy(_._1).forall(_._2.length == 5)) // k filled per query

    // exact-rerank contract: reported cosines equal brute-force cosines
    val bfCos = Similarity.bruteForceTopK(emb, queries, k = 50)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    served.foreach { case (q, n, c) =>
      bfCos.get((q, n)).foreach(e => assert(e == c, s"cosine mismatch ($q,$n)")) }

    // neighbors come only from probed cells: every result pair shares a
    // probed cell with its query
    val centroids = Similarity.loadIvfCentroids(spark, path)
    val probed = Similarity.probeCells(queries, centroids, nProbe = 3)
      .select("query_id", "cell").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val cellOf = spark.read.parquet(s"$path/codes")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    served.foreach { case (q, n, _) =>
      assert(probed(q).contains(cellOf(n)), s"neighbor $n of $q outside probed cells") }

    // stage-1 scans the CODES table partition-pruned on cell
    val plan = Similarity.ivfPqTopK(spark, path, queries, k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("codes"), plan.take(1200))
  }

  test("residual IVF-PQ: residuals centered, exact rescore, probed-cell containment, pruning") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("ivfrpq").toString + "/ix"
    val cents = Similarity.fitIvfCentroids(emb, nClusters = 8)
    val rcbs = Similarity.fitResidualPqCodebooks(emb, dim = 64, cents)
    Similarity.buildIvfRpqIndexWith(emb, path, dim = 64, cents, rcbs)

    // residuals really are the centered vectors: per-cell residual mean
    // is ~0 in every dimension (that's the whole point of the encoding)
    val resid = Similarity.cellResiduals(Similarity.assignCells(emb, cents), cents)
    val meanAbs = resid.select(explode(col("_resid")).as("x"))
      .agg(avg(abs(col("x")))).head().getDouble(0)
    val rawMeanAbs = emb.select(explode(col("embedding")).as("x"))
      .agg(avg(abs(col("x")))).head().getDouble(0)
    assert(meanAbs < rawMeanAbs, s"residuals ($meanAbs) should be tighter than raw ($rawMeanAbs)")

    val served = Similarity.ivfRpqTopK(spark, path, queries, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(served.map(_._1).distinct.length == 10)
    assert(served.groupBy(_._1).forall(_._2.length == 5))

    // exact-rerank contract
    val bfCos = Similarity.bruteForceTopK(emb, queries, k = 50)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    served.foreach { case (q, n, c) =>
      bfCos.get((q, n)).foreach(e => assert(e == c, s"cosine mismatch ($q,$n)")) }

    // containment in probed cells + partition pruning, like n8
    val probed = Similarity.probeCells(queries, cents, nProbe = 3)
      .select("query_id", "cell").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val cellOf = spark.read.parquet(s"$path/codes")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    served.foreach { case (q, n, _) =>
      assert(probed(q).contains(cellOf(n)), s"neighbor $n of $q outside probed cells") }
    val plan = Similarity.ivfRpqTopK(spark, path, queries, k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("codes"), plan.take(1200))
  }

  test("random projection: balanced seeded signs, exact rescore, recall grows with rerank window") {
    val signs = for (j <- 0 until 16; i <- 0 until 64)
      yield Similarity.rademacherSign(j, i)
    assert(signs.forall(s => s == 1 || s == -1))
    val pos = signs.count(_ == 1)
    assert(pos > 384 && pos < 640, s"seeded signs badly unbalanced: $pos/1024 positive")

    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    // projected vectors have dimOut entries, all finite
    val p0 = emb.select(Similarity.randomProject(col("embedding"), 64, 16).as("p"))
      .select(size(col("p"))).as[Int].collect()
    assert(p0.forall(_ == 16))

    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val bfCos = bf.map(r => (r._1, r._2) -> r._3).toMap
    val pj = Similarity.projectedTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect()
    // stage-2 rescoring is exact full-dimension cosine
    pj.foreach { case (q, n, c, _) =>
      bfCos.get((q, n)).foreach(e => assert(e == c, s"cosine mismatch ($q,$n)")) }
    // unstructured corpus is the JL worst case; assert the lever works:
    // wider rerank window ⇒ recall must not drop, and 8× recovers half
    val bfSet = bf.map(r => (r._1, r._2)).toSet
    def recallAt(rf: Int): Double = {
      val got = Similarity.projectedTopK(emb, queries, k = 5, rerankFactor = rf)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect()
      got.count(bfSet.contains) / got.length.toDouble
    }
    val (r3, r8) = (recallAt(3), recallAt(8))
    assert(r8 >= r3, s"recall must not drop with a wider window: $r3 -> $r8")
    assert(r8 >= 0.5, s"projected recall at 8x rerank = $r8")
  }

  test("cell-balanced sampling flattens the cluster distribution deterministically") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.fitIvfCentroids(emb, nClusters = 8)
    val assigned = Similarity.assignCells(emb, cents).select(col("vec_id"), col("cell"))
    val before = assigned.groupBy("cell").count().as[(Int, Long)].collect().toMap
    val sampled = graft.functions.TextAnalysis.temperatureSample(
      assigned, col("vec_id").cast("string"), "cell")
    val after = sampled.groupBy("cell").count().as[(Int, Long)].collect().toMap
    // deterministic: same call, same rows
    val again = graft.functions.TextAnalysis.temperatureSample(
        assigned, col("vec_id").cast("string"), "cell")
      .select("vec_id").as[Long].collect().toSet
    assert(again == sampled.select("vec_id").as[Long].collect().toSet)
    // flattening: the max/min cell-count imbalance must shrink
    def imbalance(m: Map[Int, Long]) = m.values.max.toDouble / m.values.min.max(1L)
    assert(imbalance(after) <= imbalance(before))
    // every cell retains at least one vector under the sqrt schedule
    assert(after.keySet == before.keySet)
    // nothing sampled IN that wasn't there
    assert(after.forall { case (c, n) => n <= before(c) })
  }

  test("PQ-ADC: codes in range, exact rescored cosines, decent recall vs brute force") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val codebooks = Similarity.fitPqCodebooks(emb, dim = 64, m = 8, ks = 16)
    assert(codebooks.size == 8 && codebooks.forall(_.size == 16))
    assert(codebooks.forall(_.forall(_._2.size == 8)))

    // every corpus row gets one code per subspace, each in [0, 16)
    val coded = Similarity.pqEncode(emb, codebooks, dim = 64)
    val bad = (0 until 8).map(s0 =>
      coded.filter(col(s"_c$s0") < 0 || col(s"_c$s0") >= 16).count()).sum
    assert(bad == 0)

    val pq = Similarity.pqTopK(emb, queries, k = 5, codebooks, dim = 64)
      .as[(Long, Long, Double, Int)].collect()
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect()
    // stage-2 rescoring is exact: any (query, neighbor) PQ returns must
    // carry the identical cosine brute force computes
    val bfCos = bf.map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, n, c, _) =>
      bfCos.get((q, n)).foreach(e => assert(e == c, s"cosine mismatch ($q,$n)")) }
    // Recall scales with the rerank window — the ADC lever. The test
    // corpus is unstructured (near-random cosines, the hardest case
    // for a coarse 16-code quantizer), so assert the ordering: a wider
    // window must recover materially more of the true top-5, and at 8×
    // at least half of it.
    val bfSet = bf.map(r => (r._1, r._2)).toSet
    def recallAt(rf: Int): Double = {
      val got = Similarity.pqTopK(emb, queries, k = 5, codebooks, dim = 64, rerankFactor = rf)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect()
      got.count(bfSet.contains) / got.length.toDouble
    }
    val (r3, r8) = (recallAt(3), recallAt(8))
    assert(r8 >= r3, s"recall must not drop with a wider window: $r3 -> $r8")
    assert(r8 >= 0.5, s"PQ recall at 8x rerank = $r8")

    // per-query contract: ranks are 1..n, cosines non-increasing
    pq.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  // two well-separated 8-dim modes + ids — kmeansFit fixtures
  private def twoModeCorpus: org.apache.spark.sql.DataFrame =
    (0L until 60L).map { i =>
      val base = if (i < 30) 0f else 10f
      (i, Seq.tabulate(8)(d => base + 0.01f * ((i * 7 + d * 3) % 11)))
    }.toDF("vec_id", "embedding")

  test("kmeansFit: deterministic, recovers well-separated modes, cost non-increasing") {
    val corpus = twoModeCorpus
    val fit1 = Similarity.kmeansFit(corpus, k = 2, iterations = 3)
    val fit2 = Similarity.kmeansFit(corpus, k = 2, iterations = 3)
    assert(fit1 == fit2, "identical corpus+k+iterations must refit identical centroids")

    // after 3 rounds the two centroids must sit in distinct modes
    val means = fit1.map { case (_, c) => c.sum / c.size }.sorted
    assert(means.head < 2.0 && means.last > 8.0,
      s"centroids must separate the two modes, got means $means")

    // Lloyd invariant: total squared distance to the assigned centroid
    // never increases with more iterations
    def cost(cen: Seq[(Int, Seq[Double])]): Double = {
      val byCell = cen.toMap
      corpus.as[(Long, Seq[Float])].collect().map { case (_, v) =>
        cen.map { case (i, c) =>
          v.zip(byCell(i)).map { case (x, y) => (x - y) * (x - y) }.sum
        }.min
      }.sum
    }
    val seedOnly = Similarity.kmeansFit(corpus, k = 2, iterations = 0)
    assert(seedOnly == Similarity.kmeansSeed(corpus, 2),
      "zero iterations must return the seed unchanged")
    val costs = Seq(seedOnly, Similarity.kmeansFit(corpus, 2, 1), fit1).map(cost)
    assert(costs.sliding(2).forall(p => p(1) <= p(0) + 1e-9),
      s"Lloyd cost must be non-increasing: $costs")
  }

  test("kmeansFit: an empty cell keeps its previous centroid") {
    val corpus = twoModeCorpus
    // plant an init centroid far from every vector: it can capture
    // nothing and must survive every round unchanged
    val outlier = Seq.fill(8)(-1000.0)
    val init = Seq(0 -> Seq.fill(8)(0.0), 1 -> Seq.fill(8)(10.0), 2 -> outlier)
    val fit = Similarity.kmeansFit(corpus, k = 3, iterations = 2, init = Some(init))
    assert(fit.toMap.apply(2) == outlier,
      "a cell that captures no vectors must carry its centroid forward")
    // and the live cells still updated
    assert(fit.toMap.apply(0) != init.toMap.apply(0))
  }

  test("assignCellsD: argmin with ties to the lower cell, double-literal arithmetic") {
    val corpus = Seq((0L, Seq(1f, 1f)), (1L, Seq(5f, 5f))).toDF("vec_id", "embedding")
    // two identical centroids: tie must go to cell 0
    val cen = Seq(0 -> Seq(1.0, 1.0), 1 -> Seq(1.0, 1.0), 2 -> Seq(5.0, 5.0))
    val got = Similarity.assignCellsD(corpus, cen)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 2))
  }

  test("buildIvfIndex self-fit: lloydIterations serves the same contract as the ML fit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-selffit").toString
    val corpus = twoModeCorpus
    Similarity.buildIvfIndex(corpus, dir, nClusters = 2, lloydIterations = Some(3))
    val centroids = Similarity.loadIvfCentroids(spark, dir)
    assert(centroids.size == 2)
    // the self-fit centroids are kmeansFit's, float-cast for serving
    val fitF = Similarity.kmeansFit(corpus, 2, 3)
      .map { case (i, c) => (i, c.map(_.toFloat)) }
    assert(centroids.sortBy(_._1) == fitF.sortBy(_._1))
    // serving path works end to end on the self-fit index
    val got = Similarity.ivfTopKIndexed(spark, dir, corpus.filter(col("vec_id") === 0L),
      k = 3, nProbe = 1)
    assert(got.count() == 3)
  }

  // ---- knnGraphAuto: the dedup-first kNN-graph dispatch (e4/e6) ----

  // cloned corpus: 40 base vectors from the real test embeddings,
  // each replicated 1 + (id % 4) times under fresh ids — mixed group
  // sizes (1..4) exercise self-edges, member expansion, and tie-break
  // interleaving between clone groups
  private def clonedCorpus: org.apache.spark.sql.DataFrame = {
    val base = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 40L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val rows = base.flatMap { case (id, v) =>
      (0L to id % 4).map(c => (id + 1000L * (c + 1L), v))
    } ++ base
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("knnGraphAuto: both regimes emit the identical graph (cloned corpus, e4 form)") {
    val corpus = clonedCorpus
    val cen = Similarity.fitIvfCentroids(corpus, nClusters = 4)
    val canon = Similarity.withCanonIds(corpus)
    val direct = Similarity.knnGraphDirect(canon, cen, k = 3, maxCellSize = 20, None)
      .as[(Long, Long, Double, Int)].collect().toSet
    val collapsed = Similarity.knnGraphCollapsed(canon, cen, k = 3, maxCellSize = 20, None)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(direct.nonEmpty)
    assert(collapsed === direct, "regimes must be unobservable in the output")
    // the dispatcher picks SOME regime; output must equal both
    val auto = Similarity.knnGraphAuto(corpus, cen, k = 3, maxCellSize = 20)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(auto === direct)
    spark.catalog.clearCache()
  }

  test("knnGraphAuto: regime parity holds under the margin ghost probe (e6 form)") {
    val corpus = clonedCorpus
    val cen = Similarity.fitIvfCentroids(corpus, nClusters = 4)
    val canon = Similarity.withCanonIds(corpus)
    val m = Some(0.05)
    val direct = Similarity.knnGraphDirect(canon, cen, k = 3, maxCellSize = 20, m)
      .as[(Long, Long, Double, Int)].collect().toSet
    val collapsed = Similarity.knnGraphCollapsed(canon, cen, k = 3, maxCellSize = 20, m)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(direct.nonEmpty)
    assert(collapsed === direct)
    spark.catalog.clearCache()
  }

  test("knnGraphAuto: clone mates dominate a clone group's neighbors (self-edge expansion)") {
    // id 3 has group {3, 1003, 2003, 3003} (3 % 4 = 3 → 3 clones):
    // every member's top-3 must be its 3 fellow clones at cosine 1.0,
    // lowest ids first
    val corpus = clonedCorpus
    val cen = Similarity.fitIvfCentroids(corpus, nClusters = 4)
    val out = Similarity.knnGraphAuto(corpus, cen, k = 3, maxCellSize = 20)
      .filter(col("src").isin(3L, 1003L, 2003L, 3003L))
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(e => (e._2, e._3)).toSeq).toMap
    val group = Set(3L, 1003L, 2003L, 3003L)
    group.foreach { id =>
      val expect = (group - id).toSeq.sorted.map(g => (g, 1.0))
      assert(out(id) == expect, s"src $id")
    }
    spark.catalog.clearCache()
  }

  test("withCanonIds: canonical is the min id per identical embedding; distinct rows self-canon") {
    val df = Seq(
      (5L, Seq(1f, 2f)), (9L, Seq(1f, 2f)), (2L, Seq(1f, 2f)),
      (7L, Seq(3f, 4f)), (8L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    val canon = Similarity.withCanonIds(df)
      .select("vec_id", "canon_id").as[(Long, Long)].collect().toMap
    assert(canon == Map(5L -> 2L, 9L -> 2L, 2L -> 2L, 7L -> 7L, 8L -> 8L))
    // probe: 5 rows, 3 distinct → clone ratio ≈ 0.4 (estimator, wide net)
    val ratio = Similarity.embeddingCloneRatio(df)
    assert(ratio > 0.2 && ratio < 0.6, s"got $ratio")
  }
}
