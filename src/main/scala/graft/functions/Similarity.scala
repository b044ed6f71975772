package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (Array[Float]).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
 *    query set against the corpus; the corpus is never shuffled, the
 *    per-query top-k is a window over (query, cosine). The baseline.
 *  - [[lshTopK]]: hyperplane-LSH bucketed search — corpus is bucketed
 *    once by a deterministic signature; queries probe only their own
 *    bucket (plus Hamming-1 neighbors), so scan cost per query is
 *    corpus/2^planes on average. The 100 TB path: bucketing is a
 *    one-time shuffle, probes are hash lookups.
 *
 * All arithmetic in double with a sequential left-fold dot product —
 * deterministic and portable.
 */
object Similarity {

  /** Sequential dot product over two float arrays (double math).
   * Backed by the codegen'd [[graft.functions.expressions.FloatVecDot]]
   * — the interpreted higher-order-function formulation
   * (`aggregate(zip_with(...))`) was the pipeline bottleneck. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumns.column(
      graft.functions.expressions.FloatVecDot(
        org.apache.spark.sql.graftshim.GraftColumns.expression(a),
        org.apache.spark.sql.graftshim.GraftColumns.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 for zero-norm inputs). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** [[cosine]] with the two norms PRECOMPUTED per row (staged in the
   * projections feeding a pair join). Value-identical — `na * nb`
   * multiplies the same IEEE doubles `sqrt(dot(a,a)) * sqrt(dot(b,b))`
   * would produce, and the zero-guard/division tree is unchanged — but
   * the O(pairs) stage evaluates ONE FloatVecDot instead of three:
   * each side's ‖·‖ is computed once per ROW before the join instead
   * of once per PAIR inside it (a cell-bounded join evaluates each
   * row's norm |cell| times otherwise). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val nn = na * nb
    when(nn === 0, lit(0.0)).otherwise(dot(a, b) / nn)
  }

  /**
   * Int8 scalar quantization of an embedding column — the 4×
   * compression an embedding warehouse applies before anything else
   * at 100 TB (float32 → int8 + one float scale per vector).
   * Per-vector symmetric scheme: scale = max|v_d|,
   * q_d = floor(v_d/scale·127 + 0.5) ∈ [-127, 127] (round-half-up —
   * floor(x+0.5) is sign-uniform and portable, unlike banker's
   * rounding). Zero vectors quantize to zeros with scale 0.
   * Arithmetic is double throughout and mirrors the n4 oracle SQL
   * term-for-term. Output: original columns + (scale, qvec).
   */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    // stage the scale first: a lambda body re-evaluates captured
    // expression trees per element (array_max over 64 dims × 64
    // elements otherwise)
    val staged = df.withColumn("scale",
      array_max(transform(col(vecCol), x => abs(x.cast("double")))))
    staged.withColumn("qvec",
      when(col("scale") === 0.0,
        transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol),
          x => floor(x.cast("double") / col("scale") * 127.0 + 0.5).cast("int"))))
  }

  /** Dequantize back to float: v_d ≈ q_d·scale/127. */
  def dequantizeInt8(qvec: Column, scale: Column): Column =
    transform(qvec, q => (q.cast("double") * scale / 127.0).cast("float"))

  /**
   * Two-stage quantized ANN — the retrieval shape that makes int8
   * quantization pay at 100 TB: stage 1 scans ONLY the 4×-smaller
   * int8 corpus for candidates (per-vector symmetric scales cancel in
   * cosine, so quantized cosine needs no rescaling); stage 2 fetches
   * full-precision vectors for the `k·rerankFactor` survivors per
   * query and reranks exactly. The float corpus is touched only
   * through the (broadcast-sized) candidate join, never scanned.
   *
   * Determinism: int8 dots are exact integers in double (≤ 127²·dim
   * ≪ 2⁵³), so stage-1 ranking is bit-stable across engines and the
   * whole operator is oracle-expressible. Output: (query_id,
   * neighbor_id, cosine, rank) — exact cosines, same shape as
   * [[bruteForceTopK]].
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      rerankFactor: Int = 3): DataFrame = {
    def asFloats(qvec: Column) = transform(qvec, _.cast("float"))
    // stage-1 norms precomputed per ROW (cosineWithNorms): the scan
    // evaluates |corpus|×|queries| cosines — one FloatVecDot per pair,
    // not three
    val qCorpus = quantizeInt8(corpus, "embedding")
      .select(col("vec_id").as("neighbor_id"), asFloats(col("qvec")).as("_cq"))
      .withColumn("_cqn", norm(col("_cq")))
    val qQueries = quantizeInt8(queries, "embedding")
      .select(col("vec_id").as("query_id"), asFloats(col("qvec")).as("_qq"))
      .withColumn("_qqn", norm(col("_qq")))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    val cands = qCorpus.crossJoin(broadcast(qQueries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", round(cosineWithNorms(
        col("_cq"), col("_qq"), col("_cqn"), col("_qqn")), 6))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic Rademacher sign for (outDim j, inDim i): ±1 from
   * the parity of the first md5 hex nibble of "rp:j|i" — the seeded,
   * engine-reproducible stand-in for a sampled ±1 projection matrix
   * (no RNG to synchronize across executors). */
  def rademacherSign(j: Int, i: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (("0123456789abcdef".indexOf(digest.charAt(0)) & 1) == 0) 1 else -1
  }

  /**
   * ±1 random projection (Achlioptas 2003 / sparse JL): out[j] =
   * Σ_i sign(j,i)·v[i] over the deterministic [[rademacherSign]]
   * matrix — a dimIn→dimOut reduction that preserves pairwise angles
   * within JL distortion at 4× less data scanned per distance. Backed
   * by the codegen'd [[graft.functions.expressions.FloatRandProject]]
   * (a 1024-node composed expression tree fell out of efficient
   * codegen); per output dim the sum is a fixed left-associated
   * double accumulation, then cast to float, so both engines round
   * identically.
   */
  def randomProject(vec: Column, dimIn: Int, dimOut: Int): Column =
    org.apache.spark.sql.graftshim.GraftColumns.column(
      graft.functions.expressions.FloatRandProject(
        org.apache.spark.sql.graftshim.GraftColumns.expression(vec), dimIn, dimOut))

  /**
   * Two-stage random-projection ANN — the JL companion to
   * [[quantizedTopK]]: stage 1 ranks candidates by cosine in the
   * dimOut-dim projected space (4× fewer multiply-adds per pair at
   * 64→16, and the projected corpus is the only thing the candidate
   * scan touches); stage 2 fetches full-precision vectors for the
   * k·rerankFactor survivors and reranks exactly. Queries broadcast
   * in both stages; the corpus is never shuffled. Output: (query_id,
   * neighbor_id, cosine, rank) — exact cosines.
   */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dimIn: Int = 64, dimOut: Int = 16, rerankFactor: Int = 3): DataFrame = {
    // stage-1 norms precomputed per ROW (cosineWithNorms) — one
    // FloatVecDot per candidate pair instead of three
    val pCorpus = corpus.select(col("vec_id").as("neighbor_id"),
      randomProject(col("embedding"), dimIn, dimOut).as("_cp"))
      .withColumn("_cpn", norm(col("_cp")))
    val pQueries = queries.select(col("vec_id").as("query_id"),
      randomProject(col("embedding"), dimIn, dimOut).as("_qp"))
      .withColumn("_qpn", norm(col("_qp")))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id"))
    val cands = pCorpus.crossJoin(broadcast(pQueries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("pcos", round(cosineWithNorms(
        col("_cp"), col("_qp"), col("_cpn"), col("_qpn")), 6))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic hyperplane weight for (plane, dim): md5-derived
   * integer in [-7.5, 7.5] — reproducible in any engine with md5. */
  def planeWeight(plane: Int, dim: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane|$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    "0123456789abcdef".indexOf(digest.charAt(0)) - 7.5
  }

  /**
   * Exact cosine top-k: for each query vector, the k nearest corpus
   * vectors. `queries` is expected to be small (broadcast). Cosines are
   * rounded to 6 decimals before ranking so ordering (and therefore
   * the result set) is stable across engines; ties break by corpus id.
   * Output: (query_id, neighbor_id, cosine, rank).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms staged per ROW before the |corpus|×|queries| cross join
    // (see [[cosineWithNorms]]) — each corpus norm was recomputed once
    // per query otherwise
    val joined = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"),
        norm(col("embedding")).as("_cn"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("_qv"), norm(col("embedding")).as("_qn"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineWithNorms(
        col("_cv"), col("_qv"), col("_cn"), col("_qn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Σ x² over a float vector — the SEQUENTIAL double fold shared by
   * the Spark expressions and the generated oracle literals. */
  def sqSum(c: Seq[Float]): Double =
    c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)

  /**
   * Derived default cell count for the KMeans-cell family: k ≈
   * N/targetCellSize, floored at 16. The Σ|cell|² pair bound of the
   * cell-bounded joins (SemDeDup/kNN) and the nProbe/nClusters probe
   * fraction only keep their meaning at growing corpus size if k GROWS
   * with N — a fixed k=16 at 100× the corpus means ~6 M-vector cells.
   * Capped at 1024 because [[assignCells]] encodes centroids as
   * literal expressions (`least` over k structs); past ~1k cells the
   * argmin should become a broadcast join against a centroid table
   * instead (and [[boundCells]] still bounds the pair space if cells
   * outgrow the cap).
   */
  def adaptiveCellCount(corpusSize: Long, targetCellSize: Long = 4096L,
      floorCells: Int = 16, capCells: Int = 1024): Int =
    math.min(capCells.toLong,
      math.max(floorCells.toLong, (corpusSize + targetCellSize - 1) / targetCellSize)).toInt

  /**
   * Fit the IVF coarse quantizer (KMeans, fixed seed/iterations) and
   * return the centroids as (cell, float vector). Deterministic for a
   * given corpus, so an external oracle generator can refit the SAME
   * centroids and embed them as literals (Verify does exactly this for
   * the n3 DuckDB oracle). `nClusters = 0` (the default) derives k
   * from the corpus size via [[adaptiveCellCount]] — one count job,
   * deterministic, so the derived fit is as oracle-reproducible as a
   * fixed one.
   */
  def fitIvfCentroids(corpus: DataFrame, nClusters: Int = 0,
      seed: Long = 42L, maxIter: Int = 8): Seq[(Int, Seq[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = if (nClusters > 0) nClusters else adaptiveCellCount(corpus.count())
    // coarse quantizer: cell boundaries don't need convergence, they
    // need stability — few iterations, fixed seed
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
      .fit(corpus.select(array_to_vector(col("embedding")).as("features")))
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }.toSeq
  }

  /** Σ x² over a DOUBLE vector — same sequential fold as [[sqSum]],
   * for [[kmeansFit]]'s double-precision iterated centroids. */
  def sqSumD(c: Seq[Double]): Double = c.foldLeft(0.0)((a, x) => a + x * x)

  /**
   * Deterministic hash-spread KMeans seeding: the k corpus vectors
   * with the smallest md5-derived 32-bit hash of their id (ties on
   * id), numbered 0..k-1 in that order. Pseudo-random coverage of the
   * corpus without any RNG state — an external oracle reproduces the
   * identical seed from the table alone, and at 100 TB the seed scan
   * is one TakeOrdered over a map-only hash projection (no shuffle of
   * the vectors themselves).
   */
  def kmeansSeed(corpus: DataFrame, k: Int): Seq[(Int, Seq[Double])] = {
    val seeded = corpus
      .select(col("vec_id"), col("embedding"),
        Dedup.md5Hash32(col("vec_id").cast("string")).as("_h"))
      .orderBy(col("_h"), col("vec_id"))
      .limit(k)
      .collect() // k rows — fixed-K centroid collect, bounded
    require(seeded.length == k, s"corpus has fewer than $k vectors")
    seeded.zipWithIndex.map { case (r, i) =>
      (i, r.getSeq[Float](1).map(_.toDouble).toSeq)
    }.toSeq
  }

  /**
   * Full Lloyd KMeans fit as a first-class, oracle-reproducible
   * operator — the production step that turns a raw embedding corpus
   * into the coarse quantizer every IVF index and cell-bounded dedup
   * in this library consumes ([[fitIvfCentroids]]'s Spark-ML fit is
   * the convenience path; THIS fit is the one an external system can
   * replay bit-exactly, the e2-single-step composed to a fixed
   * iteration count the way GraphRank composes its power iteration).
   *
   * Per iteration (the standard distributed KMeans shape — Spark ML's
   * own loop is the same): a map-only argmin assignment against the
   * current centroids embedded as DOUBLE literals (score
   * `cc − 2·v·c`, ties to the lower cell — [[assignCells]]'s exact
   * contract), then ONE hash aggregation computing each cell's mean
   * per dimension in exact integer micro-units
   * (`floor(v·1e6 + 0.5)` longs, so partial-aggregate order can't
   * move a ulp), collected to the driver as the next round's
   * centroids — k·dim values, bounded by [[adaptiveCellCount]]'s
   * k ≤ 1024 cap. New centroid = `round(Σmicro/n/1e6, 6)` double —
   * the identical expression DuckDB evaluates, so every iteration's
   * centroids (and therefore every assignment) replay bit-equal in
   * the generated unrolled-iteration oracle. A cell that captures no
   * vectors keeps its previous centroid.
   *
   * Scale: per round, one broadcast of k·dim doubles (as literals),
   * one map-only scan, one k·dim-row shuffle — no vector ever
   * shuffles. 100 TB cost = iterations × one pass over the corpus,
   * the floor for any exact Lloyd fit.
   */
  def kmeansFit(corpus: DataFrame, k: Int, iterations: Int,
      init: Option[Seq[(Int, Seq[Double])]] = None): Seq[(Int, Seq[Double])] = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    var cen = init.getOrElse(kmeansSeed(corpus, k))
    require(cen.size == k, s"init must have $k centroids, got ${cen.size}")
    for (_ <- 1 to iterations) {
      val updated = assignCellsD(corpus, cen)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("_micro", floor(col("v").cast("double") * 1e6 + 0.5).cast("long"))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("_micro")).as("_sum"))
        .select(col("cell"), col("pos"),
          round(col("_sum").cast("double") / col("n") / 1e6, 6).as("v"))
        .collect() // ≤ k·dim rows (fixed-K centroid collect)
      val byCell: Map[Int, Seq[Double]] = updated
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cen = cen.map { case (i, old) => (i, byCell.getOrElse(i, old)) }
    }
    cen
  }

  /** [[assignCells]] against DOUBLE-precision centroids (the
   * [[kmeansFit]] loop's iterated values — a float cast would corrupt
   * the `round(x, 6)` doubles the oracle replays). Same map-only
   * literal-argmin plan, same tie-to-lower-cell contract. */
  def assignCellsD(corpus: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val assignScore = centroids.map { case (i, c) =>
      struct((lit(sqSumD(c)) - lit(2.0) * dot(col("embedding"), typedLit(c))).as("d"),
        lit(i).as("cell"))
    }
    corpus.select(col("vec_id"), col("embedding"),
      least(assignScore: _*).getField("cell").as("cell"))
  }

  /**
   * IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
   * corpus vector to a cell; each query probes only the `nProbe`
   * nearest cells. The classic trade: one clustering pass over the
   * corpus (done once, reusable), then per-query work scales with
   * nProbe/nClusters of the corpus. Results are exact cosine within
   * probed cells. Output: (query_id, neighbor_id, cosine, rank).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int = 0, nProbe: Int = 2): DataFrame =
    ivfTopKWith(corpus, queries, k, fitIvfCentroids(corpus, nClusters), nProbe)

  /**
   * Corpus → cell assignment against FIXED centroids. Map-only
   * `least`-of-structs over centroid LITERALS — no shuffle, no per-row
   * model inference, stays in whole-stage codegen. The assignment
   * score is the euclidean argmin with the per-row constant ‖v‖²
   * dropped: `cc_i - 2·v·c_i` (exact-math equivalent ordering),
   * computed with the same sequential double arithmetic the generated
   * DuckDB oracle uses, so assignments — including fp near-ties —
   * agree bit-for-bit across engines. Ties break on the lower cell.
   * Output: (vec_id, embedding, cell).
   */
  def assignCells(corpus: DataFrame, centroids: Seq[(Int, Seq[Float])]): DataFrame =
    corpus.select(col("vec_id"), col("embedding"), cellExpr(centroids).as("cell"))

  /** [[assignCells]] keeping EVERY input column (metadata travels with
   * the vector into the index — the layout filtered ANN scans need). */
  def assignCellsKeeping(corpus: DataFrame, centroids: Seq[(Int, Seq[Float])]): DataFrame =
    corpus.withColumn("cell", cellExpr(centroids))

  /** The literal-centroid argmin Column shared by both assignment
   * shapes (see [[assignCells]] for the arithmetic contract). */
  private def cellExpr(centroids: Seq[(Int, Seq[Float])]): Column = {
    val cc: Map[Int, Double] = centroids.map { case (i, c) => i -> sqSum(c) }.toMap
    val assignScore = centroids.map { case (i, c) =>
      struct((lit(cc(i)) - lit(2.0) * dot(col("embedding"), typedLit(c))).as("d"),
        lit(i).as("cell"))
    }
    least(assignScore: _*).getField("cell")
  }

  /**
   * Cell assignment with a BOUNDARY-MARGIN ghost probe — the
   * cross-cell recall lever for the cell-bounded pair family
   * (SemDeDup / kNN-graph): a vector whose second-nearest cell is
   * within `margin` of its nearest (assignment score `cc − 2·v·c`,
   * i.e. squared euclidean minus the per-row constant ‖v‖²) is ALSO
   * placed in that second cell. Near-boundary vectors then meet their
   * across-the-boundary neighbors in one of the two cells, closing
   * the documented cross-cell miss at a bounded cost: pair space grows
   * by at most the boundary fraction — never all-pairs. Deterministic
   * (same literal-centroid arithmetic as [[assignCells]], ties on the
   * lower cell), so generated oracles reproduce the expansion exactly.
   * Output: one row per (vector, probed cell): (vec_id, embedding,
   * home_cell, cell); `cell == home_cell` marks the primary row.
   */
  def assignCellsWithMargin(corpus: DataFrame, centroids: Seq[(Int, Seq[Float])],
      margin: Double): DataFrame = {
    require(centroids.size >= 2, "margin probe needs at least two cells")
    val cc: Map[Int, Double] = centroids.map { case (i, c) => i -> sqSum(c) }.toMap
    val scored = array(centroids.map { case (i, c) =>
      struct((lit(cc(i)) - lit(2.0) * dot(col("embedding"), typedLit(c))).as("d"),
        lit(i).as("cell"))
    }: _*)
    def nth(k: Int) = element_at(col("_sorted"), k)
    corpus
      .withColumn("_sorted", array_sort(scored)) // (d asc, cell asc) — least()'s order
      .withColumn("home_cell", nth(1).getField("cell"))
      .withColumn("_cells",
        when(nth(2).getField("d") - nth(1).getField("d") <= margin,
          array(nth(1).getField("cell"), nth(2).getField("cell")))
          .otherwise(array(nth(1).getField("cell"))))
      .select(col("vec_id"), col("embedding"), col("home_cell"),
        explode(col("_cells")).as("cell"))
  }

  /**
   * Per-cell pair-cap guard for cell-bounded self-joins (SemDeDup /
   * kNN-graph) — the cell family's analogue of the dedup stop-shingle
   * cap: a cell of size f contributes f² candidate pairs, so one
   * runaway cell (dense embedding mode, or a corpus that outgrew its
   * k) can dominate the join. Cells larger than `maxCellSize` are
   * deterministically SPLIT into ceil(|cell|/maxCellSize) sub-cells by
   * an md5-derived hash of the vector id (hash, not raw id: id
   * residues can be adversarially non-uniform; md5 spreads any id set
   * evenly w.h.p., so sub-cell sizes concentrate near maxCellSize).
   * Pairs are then generated within sub-cells only — a deterministic
   * recall trade mirrored exactly by the generated oracles, never a
   * score change (verification stays exact cosine).
   * Output: input columns + `subcell` (string join key).
   */
  def boundCells(assigned: DataFrame, maxCellSize: Int): DataFrame = {
    val counts = assigned.groupBy(col("cell")).agg(count(lit(1)).as("_cn"))
    assigned.join(broadcast(counts), Seq("cell"))
      .withColumn("_nsub",
        ceil(col("_cn").cast("double") / maxCellSize).cast("long"))
      .withColumn("subcell", concat_ws("_", col("cell"),
        pmod(Dedup.md5Hash32(col("vec_id").cast("string")), col("_nsub"))))
      .drop("_cn", "_nsub")
  }

  /**
   * (vec_id, embedding, canon_id): canonical id = min vec_id among
   * byte-identical embeddings — the exact-clone collapse key the
   * dedup-first kNN family groups on. Grouping is by the embedding
   * VALUE (one shuffle of (embedding, vec_id) keyed on the array), so
   * the collapse is exact — no digest-collision caveat; at 100 TB
   * swap the partition key for a 128-bit digest of the raw bytes and
   * keep the same shape.
   */
  def withCanonIds(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .withColumn("canon_id",
        min(col("vec_id")).over(Window.partitionBy(col("embedding"))))

  /** Exact-clone mass of an embedding corpus in [0,1] from ONE
   * map-side-partial pass — [[graft.functions.Dedup.cloneRatio]]'s
   * probe with xxhash64(embedding) standing in for md5(text) (probe
   * only: a 64-bit collision can nudge the estimate, never the
   * output, since the dispatch it feeds is output-invariant). */
  def embeddingCloneRatio(corpus: DataFrame): Double = {
    val r = corpus.agg(count(lit(1)).as("n"),
      approx_count_distinct(xxhash64(col("embedding")), 0.02).as("d")).head()
    val total = r.getLong(0)
    if (total == 0L) 0.0 else 1.0 - r.getLong(1).toDouble / total
  }

  /** [[boundCells]] with the sub-split keyed on the CANONICAL id and
   * the census counting DISTINCT canonicals — clone-invariant by
   * construction: clones share cell, canon hash, and census weight 1,
   * so the subcell layout of a corpus does not move when clones are
   * collapsed out or expanded back. Expects `canon_id` on the input;
   * this invariance is what lets [[knnGraphAuto]]'s two regimes emit
   * the identical graph. */
  def boundCellsByCanon(assigned: DataFrame, maxCellSize: Int): DataFrame = {
    val counts = assigned.groupBy(col("cell"))
      .agg(countDistinct(col("canon_id")).as("_cn"))
    assigned.join(broadcast(counts), Seq("cell"))
      .withColumn("_nsub",
        ceil(col("_cn").cast("double") / maxCellSize).cast("long"))
      .withColumn("subcell", concat_ws("_", col("cell"),
        pmod(Dedup.md5Hash32(col("canon_id").cast("string")), col("_nsub"))))
      .drop("_cn", "_nsub")
  }

  /**
   * Density-dispatched kNN-graph construction — the e4/e6 entry point
   * with the d16 discipline: one [[embeddingCloneRatio]] probe picks
   * the regime, and BOTH regimes emit the identical graph, so the
   * dispatch is unobservable in the output.
   *
   * The graph spec (shared by both regimes and the generated oracle):
   * candidates for vector v are all u ≠ v sharing a (sub)cell —
   * cells from the literal-centroid argmin ([[assignCells]], or
   * [[assignCellsWithMargin]] when `margin` is set — the cross-cell
   * ghost probe), sub-split by [[boundCellsByCanon]]; edges rank per
   * src by (round-6 cosine DESC, dst ASC), keep rank ≤ k.
   *
   * Clone regime (ratio ≥ `cloneRatioFrom`): clones collapse to their
   * canonical BEFORE the pair join — the Σ|cell|² pair space shrinks
   * by the square of the clone factor (the r11 sf1 cliff: e6 ran
   * 12.6× wall for 10× rows because every 10-way clone group
   * contributed 100× pairs). Canonical edges carry each dst group's
   * member count; an edge is pruned iff ≥ k candidates sit at
   * STRICTLY higher cosine (a running-sum range frame — ties kept, so
   * the id tie-break can never need a pruned edge), then surviving
   * edges expand to member pairs and re-rank. Clone mates enter as a
   * self-edge (cosine computed by the same expression over the
   * identical array, so it equals the direct pair value bit-for-bit).
   *
   * Distinct regime: the direct pair join (cheapest when there is
   * nothing to collapse — the collapse/expand joins would be pure
   * overhead).
   */
  /** Persist + MATERIALIZE a stage referenced by several downstream
   * subtrees. AQE materializes independent exchange subtrees
   * concurrently, and a persisted-but-uncomputed cache block gives no
   * cross-task compute lock — every referencing subtree recomputes the
   * stage's full lineage (profiled: 8 corpus passes in one d7 action,
   * and the canon window shuffle here ran once per reference). Eager
   * materialization makes every later reference a cache read.
   * CALLER-owned: released by the per-query clearCache (Bench/Verify)
   * or an explicit unpersist. */
  private def eager(df: DataFrame): DataFrame = df.localCheckpoint(true)

  def knnGraphAuto(corpus: DataFrame, centroids: Seq[(Int, Seq[Float])],
      k: Int, maxCellSize: Int, margin: Option[Double] = None,
      cloneRatioFrom: Double = 0.10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // eager: the embedding-keyed window shuffle behind canon_id is
    // referenced 2× (direct) to 5× (collapsed) — one pass, not five
    val canon = eager(withCanonIds(corpus))
    if (embeddingCloneRatio(corpus) >= cloneRatioFrom)
      knnGraphCollapsed(canon, centroids, k, maxCellSize, margin)
    else
      knnGraphDirect(canon, centroids, k, maxCellSize, margin)
  }

  /** Canon-annotated (sub)cell assignment shared by the two
   * [[knnGraphAuto]] regimes: argmin cells (with the optional margin
   * ghost probe), canonical ids joined back, canon-keyed sub-split. */
  private def canonBounded(canon: DataFrame, centroids: Seq[(Int, Seq[Float])],
      maxCellSize: Int, margin: Option[Double]): DataFrame = {
    val base = canon.select(col("vec_id"), col("embedding"))
    val assigned = margin match {
      case None => assignCells(base, centroids)
      case Some(m) => assignCellsWithMargin(base, centroids, m).drop("home_cell")
    }
    // NOT materialized: both pair-join sides are canonically identical
    // subtrees, so AQE's stage cache reuses one exchange for both —
    // materializing here only adds a job (measured, r16 opt round)
    boundCellsByCanon(
      assigned.join(canon.select(col("vec_id"), col("canon_id")), Seq("vec_id")),
      maxCellSize)
  }

  private[graft] def knnGraphDirect(canon: DataFrame,
      centroids: Seq[(Int, Seq[Float])], k: Int, maxCellSize: Int,
      margin: Option[Double]): DataFrame = {
    val bounded = canonBounded(canon, centroids, maxCellSize, margin)
    // norms staged per ROW before the pair join (see [[cosineWithNorms]])
    val l = bounded.select(col("subcell"), col("vec_id").as("src"),
      col("embedding").as("_va"), norm(col("embedding")).as("_na"))
    val r = bounded.select(col("subcell"), col("vec_id").as("dst"),
      col("embedding").as("_vb"), norm(col("embedding")).as("_nb"))
    val pairs0 = l.join(r, Seq("subcell")).filter(col("src") =!= col("dst"))
    // the margin expansion can surface one pair from both probed
    // cells — dedup pairs, then re-join embeddings for the score
    val pairs = margin match {
      case None => pairs0.select(col("src"), col("dst"),
        col("_va"), col("_vb"), col("_na"), col("_nb"))
      case Some(_) =>
        val emb = canon.select(col("vec_id"), col("embedding"),
          norm(col("embedding")).as("_n"))
        pairs0.select(col("src"), col("dst")).distinct()
          .join(emb.select(col("vec_id").as("src"), col("embedding").as("_va"),
            col("_n").as("_na")), Seq("src"))
          .join(emb.select(col("vec_id").as("dst"), col("embedding").as("_vb"),
            col("_n").as("_nb")), Seq("dst"))
    }
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    pairs.withColumn("cosine", round(cosineWithNorms(
        col("_va"), col("_vb"), col("_na"), col("_nb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("cosine"), col("rank").cast("int").as("rank"))
  }

  private[graft] def knnGraphCollapsed(canon: DataFrame,
      centroids: Seq[(Int, Seq[Float])], k: Int, maxCellSize: Int,
      margin: Option[Double]): DataFrame = {
    // two consumers, but the agg subtrees are canonically identical —
    // AQE's stage cache shares the one shuffle
    val gsz = canon.groupBy(col("canon_id")).agg(count(lit(1)).as("_gn"))
    val reps = canon.filter(col("vec_id") === col("canon_id"))
      .select(col("vec_id"), col("embedding"), col("canon_id"))
    val bounded = canonBounded(reps, centroids, maxCellSize, margin)
    // norms staged per ROW before the pair join (see [[cosineWithNorms]])
    val l = bounded.select(col("subcell"), col("canon_id").as("_sc"),
      col("embedding").as("_va"), norm(col("embedding")).as("_na"))
    val r = bounded.select(col("subcell"), col("canon_id").as("_dc"),
      col("embedding").as("_vb"), norm(col("embedding")).as("_nb"))
    val cpairs0 = l.join(r, Seq("subcell")).filter(col("_sc") =!= col("_dc"))
    val cpairs = margin match {
      case None => cpairs0.select(col("_sc"), col("_dc"),
        col("_va"), col("_vb"), col("_na"), col("_nb"))
      case Some(_) =>
        val re = reps.select(col("canon_id"), col("embedding"),
          norm(col("embedding")).as("_n"))
        cpairs0.select(col("_sc"), col("_dc")).distinct()
          .join(re.select(col("canon_id").as("_sc"), col("embedding").as("_va"),
            col("_n").as("_na")), Seq("_sc"))
          .join(re.select(col("canon_id").as("_dc"), col("embedding").as("_vb"),
            col("_n").as("_nb")), Seq("_dc"))
    }
    val cedges = cpairs
      .withColumn("cosine", round(cosineWithNorms(
        col("_va"), col("_vb"), col("_na"), col("_nb")), 6))
      .join(gsz.select(col("canon_id").as("_dc"), col("_gn").as("_members")), Seq("_dc"))
      .select(col("_sc"), col("_dc"), col("cosine"), col("_members"))
    // clone mates as a self-edge: every member of a ≥2 group sees the
    // other gn−1 members at the same-array cosine
    val selfE = reps.join(gsz, Seq("canon_id")).filter(col("_gn") >= 2)
      .select(col("canon_id").as("_sc"), col("canon_id").as("_dc"),
        round(cosine(col("embedding"), col("embedding")), 6).as("cosine"),
        (col("_gn") - 1).as("_members"))
    // prune: an edge survives iff fewer than k candidates rank at
    // STRICTLY higher cosine (round-6 cosines are exact multiples of
    // 1e-6, so the integer range frame separates ties exactly); ties
    // at the boundary are kept — the member-id tie-break downstream
    // may need any of them
    val edges = cedges.unionByName(selfE)
      .withColumn("_negc", -round(col("cosine") * lit(1e6), 0).cast("long"))
    val wPrune = Window.partitionBy(col("_sc")).orderBy(col("_negc"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val kept = edges
      .withColumn("_higher", coalesce(sum(col("_members")).over(wPrune), lit(0L)))
      .filter(col("_higher") < k)
    val members = canon.select(col("canon_id"), col("vec_id"))
    val expanded = kept
      .join(members.select(col("canon_id").as("_sc"), col("vec_id").as("src")), Seq("_sc"))
      .join(members.select(col("canon_id").as("_dc"), col("vec_id").as("dst")), Seq("_dc"))
      .filter(col("src") =!= col("dst"))
    val w = Window.partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    expanded.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("cosine"), col("rank").cast("int").as("rank"))
  }

  /** Query → nProbe nearest cells by cosine-to-centroid. Query side is
   * tiny: explode the per-cell scores and rank.
   * Output: (query_id, _qv, cell). */
  def probeCells(queries: DataFrame, centroids: Seq[(Int, Seq[Float])],
      nProbe: Int): DataFrame = {
    val cc: Map[Int, Double] = centroids.map { case (i, c) => i -> sqSum(c) }.toMap
    val probeScore = centroids.map { case (i, c) =>
      struct((dot(col("_qv"), typedLit(c)) /
        (sqrt(dot(col("_qv"), col("_qv"))) * lit(math.sqrt(cc(i))))).as("d"),
        lit(i).as("cell"))
    }
    queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      .select(col("query_id"), col("_qv"), explode(array(probeScore: _*)).as("_p"))
      .withColumn("_pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_p.d").desc, col("_p.cell"))))
      .filter(col("_pr") <= nProbe)
      .select(col("query_id"), col("_qv"), col("_p.cell").as("cell"))
  }

  /** Exact-cosine ranking of probed candidates (shared tail of every
   * IVF path). `assigned` = (vec_id, embedding, cell). */
  private[graft] def rankProbed(assigned: DataFrame, qcells: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // corpus/query norms staged per ROW before the candidate join —
    // a corpus row probed by q queries paid 2q extra FloatVecDots
    // otherwise (see [[cosineWithNorms]])
    assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"),
        norm(col("embedding")).as("_cn"), col("cell"))
      .join(broadcast(qcells.withColumn("_qn", norm(col("_qv")))), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineWithNorms(
        col("_cv"), col("_qv"), col("_cn"), col("_qn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF search against a FIXED centroid set (see [[assignCells]] /
   * [[probeCells]] for the arithmetic contract with the oracle). */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Int, Seq[Float])], nProbe: Int): DataFrame =
    rankProbed(assignCells(corpus, centroids), probeCells(queries, centroids, nProbe), k)

  /**
   * Persist the IVF index: the fit-once / probe-many layout. Two
   * parquet tables under `path`:
   *  - `centroids`: (cell, center float[])
   *  - `corpus`: (vec_id, embedding) PARTITIONED BY cell — a query
   *    that probes nProbe cells reads nProbe/nClusters of the corpus
   *    via partition pruning, the disk analogue of an inverted file.
   * Rebuild when the corpus drifts (centroids are deterministic for a
   * given corpus+seed, so rebuilds are reproducible).
   *
   * `lloydIterations = Some(n)` self-fits the quantizer with the
   * oracle-reproducible [[kmeansFit]] loop instead of Spark-ML KMeans
   * — the path for an index whose build must be replayable bit-exactly
   * (e.g. cross-engine validation of a rebuilt index). Serving
   * arithmetic is float either way; the fit choice only changes where
   * the cell boundaries land.
   */
  def buildIvfIndex(corpus: DataFrame, path: String, nClusters: Int = 0,
      metaCols: Seq[String] = Nil, lloydIterations: Option[Int] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = lloydIterations match {
      case Some(iters) =>
        val k = if (nClusters > 0) nClusters else adaptiveCellCount(corpus.count())
        kmeansFit(corpus, k, iters)
          .map { case (i, c) => (i, c.map(_.toFloat)) }
      case None => fitIvfCentroids(corpus, nClusters)
    }
    centroids.toDF("cell", "center")
      .write.mode("overwrite").parquet(s"$path/centroids")
    // metadata columns ride along into the cell-partitioned corpus so
    // filtered searches push their predicate into the SAME pruned scan
    assignCellsKeeping(
        corpus.select((Seq("vec_id", "embedding") ++ metaCols).map(col): _*), centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
  }

  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(Int, Seq[Float])] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("center"))
      .as[(Int, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  /**
   * Serve top-k from a persisted index: probe cells are computed from
   * the loaded centroids, then ONLY those cell partitions of the
   * corpus are scanned (`cell.isin(...)` prunes at the source — the
   * partition filter is asserted in SimilaritySpec). No clustering at
   * query time.
   */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int,
      pred: Option[Column] = None): DataFrame = {
    val centroids = loadIvfCentroids(spark, path)
    val qcells = probeCells(queries, centroids, nProbe)
    // the probed cell set is tiny (≤ |Q|·nProbe ≤ nClusters): collect
    // it once so the scan prunes to those partitions
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // filtered ANN: a metadata predicate (over metaCols stored in the
    // index) composes with the cell pruning IN the scan — partition
    // prune × PushedFilters, so a selective filter cuts the probe cost
    // instead of post-filtering ranked results (which would also
    // under-fill k)
    val assigned = pred.foldLeft(
      spark.read.parquet(s"$path/corpus")
        .filter(col("cell").isin(probedCells: _*)))(_.filter(_))
    rankProbed(assigned, qcells, k)
  }

  /**
   * Build the IVF-SQ8 index layout — the serving shape for a corpus
   * whose float vectors don't fit the scan budget. Three tables under
   * `path`:
   *  - `centroids`: (cell, center float[])
   *  - `qcorpus`: (vec_id, qvec int8-as-int) PARTITIONED BY cell —
   *    the 4×-compressed table that probe scans actually read
   *  - `fcorpus`: (vec_id, embedding) — full precision, touched ONLY
   *    through the id-equi-join for candidates that survive stage 1
   * At 100 TB the probe cost is nProbe/nClusters of the QUANTIZED
   * corpus, and full floats are fetched for k·rerankFactor rows per
   * query, never scanned.
   */
  def buildIvfSq8Index(corpus: DataFrame, path: String, nClusters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = fitIvfCentroids(corpus, nClusters)
    centroids.toDF("cell", "center")
      .write.mode("overwrite").parquet(s"$path/centroids")
    quantizeInt8(assignCells(corpus, centroids), "embedding")
      .select(col("vec_id"), col("qvec"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/qcorpus")
    corpus.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$path/fcorpus")
  }

  /**
   * Serve top-k from a persisted IVF-SQ8 index: probe `nProbe` cells
   * (partition-pruned scan of the int8 table), rank candidates by
   * quantized cosine (per-vector symmetric scales cancel, and int8
   * dots are exact integers in double — stage-1 order is bit-stable
   * across engines), then rerank the k·rerankFactor survivors per
   * query with exact float cosine via an id join against `fcorpus`.
   * Output: (query_id, neighbor_id, cosine, rank) — exact cosines,
   * same contract as [[bruteForceTopK]]/[[ivfTopKIndexed]].
   */
  def ivfQuantizedTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int, rerankFactor: Int = 3): DataFrame = {
    def asFloats(qvec: Column) = transform(qvec, _.cast("float"))
    val centroids = loadIvfCentroids(spark, path)
    val qcells = probeCells(queries, centroids, nProbe)
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qq = quantizeInt8(queries, "embedding")
      .select(col("vec_id").as("query_id"), asFloats(col("qvec")).as("_qq"))
    val probes = qcells.select(col("query_id"), col("cell")).join(qq, Seq("query_id"))
    val wQ = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    val cands = spark.read.parquet(s"$path/qcorpus")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id").as("neighbor_id"), asFloats(col("qvec")).as("_cq"), col("cell"))
      // stage-1 norms per ROW (cosineWithNorms): a probed corpus row
      // paid 2 extra FloatVecDots per probing query otherwise
      .withColumn("_cqn", norm(col("_cq")))
      .join(broadcast(probes.withColumn("_qqn", norm(col("_qq")))), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos", round(cosineWithNorms(
        col("_cq"), col("_qq"), col("_cqn"), col("_qqn")), 6))
      .withColumn("_ar", row_number().over(wQ))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(spark.read.parquet(s"$path/fcorpus")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  // ---- Product quantization (PQ) ------------------------------------------

  /**
   * Fit PQ codebooks: the embedding space is cut into `m` contiguous
   * subspaces of dim/m dims; each subspace gets its own `ks`-centroid
   * KMeans codebook (fixed seed per subspace — deterministic for a
   * given corpus, so the n7 oracle can refit identical codebooks and
   * embed them as literals, the same contract as [[fitIvfCentroids]]).
   * Returns codebooks(sub) = Seq((code, centroid float[dim/m])).
   *
   * Storage math at 100 TB: a 64-dim float vector is 256 B; its PQ
   * code is m bytes (m=8 ⇒ 32× compression vs 4× for SQ8) — the
   * candidate scan reads codes only.
   */
  def fitPqCodebooks(corpus: DataFrame, dim: Int, m: Int = 8, ks: Int = 16,
      seed: Long = 42L, maxIter: Int = 8): Seq[Seq[(Int, Seq[Float])]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    (0 until m).map { s0 =>
      val sub = corpus.select(
        array_to_vector(slice(col("embedding"), s0 * dsub + 1, dsub)).as("features"))
      val model = new KMeans().setK(ks).setSeed(seed + s0).setMaxIter(maxIter)
        .setFeaturesCol("features").fit(sub)
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }.toSeq
    }
  }

  /**
   * PQ-encode the corpus against fixed codebooks: per subspace, the
   * nearest sub-centroid's code (euclidean argmin via the same
   * `cc − 2·v·c` literal-expression trick as [[assignCells]] — map
   * only, codegen'd, no shuffle). Also emits `_rn2`, the squared norm
   * of the implicit reconstruction Σ‖c_code‖² (an `element_at` into a
   * literal array — needed to turn ADC dots into cosines without
   * touching the float vector). Output: (vec_id, _c0.._cm-1, _rn2).
   */
  def pqEncode(corpus: DataFrame, codebooks: Seq[Seq[(Int, Seq[Float])]],
      dim: Int, keep: Seq[String] = Nil): DataFrame = {
    val m = codebooks.size
    val dsub = dim / m
    val codeCols = codebooks.zipWithIndex.map { case (cb, s0) =>
      val sl = slice(col("embedding"), s0 * dsub + 1, dsub)
      val scored = cb.map { case (i, c) =>
        struct((lit(sqSum(c)) - lit(2.0) * dot(sl, typedLit(c))).as("d"),
          lit(i).as("code"))
      }
      least(scored: _*).getField("code").as(s"_c$s0")
    }
    val coded = corpus.select((col("vec_id") +: keep.map(col)) ++ codeCols: _*)
    val rn2 = (0 until m).map { s0 =>
      val ccs: Seq[Double] = codebooks(s0).sortBy(_._1).map { case (_, c) => sqSum(c) }
      element_at(typedLit(ccs), col(s"_c$s0") + 1)
    }.reduce(_ + _)
    coded.withColumn("_rn2", rn2)
  }

  /**
   * PQ ANN with ADC (asymmetric distance computation): stage 1 scans
   * ONLY the m-byte codes — each query precomputes a per-subspace
   * lookup table of dot(query_sub, centroid) for all ks centroids
   * (m·ks small dots, query-side, broadcast), so scoring a corpus row
   * is m array lookups + m−1 adds, no float-vector arithmetic at all.
   * Approximate cosine = ADC / (‖q‖·√rn2) ranks candidates; stage 2
   * reranks the k·rerankFactor survivors per query with exact float
   * cosine via an id join (the float corpus is never scanned).
   * Output: (query_id, neighbor_id, cosine, rank) — exact cosines,
   * the same contract as every other ANN path here.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      codebooks: Seq[Seq[(Int, Seq[Float])]], dim: Int,
      rerankFactor: Int = 3): DataFrame = {
    val m = codebooks.size
    val dsub = dim / m
    val encoded = pqEncode(corpus, codebooks, dim)
      .withColumnRenamed("vec_id", "neighbor_id")
    val qTableCols = codebooks.zipWithIndex.map { case (cb, s0) =>
      val qsl = slice(col("embedding"), s0 * dsub + 1, dsub)
      array(cb.sortBy(_._1).map { case (_, c) => dot(qsl, typedLit(c)) }: _*)
        .as(s"_qt$s0")
    }
    val q = queries.select(
      Seq(col("vec_id").as("query_id"),
        sqrt(dot(col("embedding"), col("embedding"))).as("_qn")) ++ qTableCols: _*)
    val adc = (0 until m)
      .map(s0 => element_at(col(s"_qt$s0"), col(s"_c$s0") + 1))
      .reduce(_ + _)
    val denom = col("_qn") * sqrt(col("_rn2"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id"))
    val cands = encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_cos",
        round(when(denom === 0, lit(0.0)).otherwise(adc / denom), 6))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  // ---- IVF-PQ (probe-pruned product quantization) --------------------------

  /**
   * Build the IVF-PQ index — the 100 TB ANN serving shape: BOTH
   * compression and pruning. Stage-1 scans read m-byte PQ codes (32×
   * compression at m=8) AND only nProbe/nClusters of them (cell
   * partition pruning). Four tables under `path`:
   *  - `centroids`: (cell, center float[]) — the coarse quantizer
   *  - `codebooks`: (sub, code, center float[dim/m]) — PQ codebooks
   *  - `codes`: (vec_id, _c0.._cm-1, _rn2) PARTITIONED BY cell
   *  - `fcorpus`: (vec_id, embedding) — full precision, id-join only
   * Both fits are deterministic (fixed seeds), so a rebuild — or an
   * external oracle refit — reproduces the identical index.
   */
  def buildIvfPqIndex(corpus: DataFrame, path: String, dim: Int,
      nClusters: Int = 0, m: Int = 8, ks: Int = 16): Unit =
    buildIvfPqIndexWith(corpus, path, dim,
      fitIvfCentroids(corpus, nClusters), fitPqCodebooks(corpus, dim, m, ks))

  /** Per-row residual against the assigned cell centroid (`_resid`,
   * float): the exact-diff-then-round-to-float arithmetic is a single
   * IEEE rounding, identical in any engine, so residual codes are
   * oracle-reproducible. `assigned` = assignCells output; centroids
   * must be the dense 0..k-1 fit the assignment used. */
  def cellResiduals(assigned: DataFrame, centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    val cents: Seq[Seq[Float]] = centroids.sortBy(_._1).map(_._2)
    assigned.withColumn("_resid",
      zip_with(col("embedding"), element_at(typedLit(cents), col("cell") + 1),
        (a, b) => a - b))
  }

  /**
   * Residual IVF-PQ — the index FAISS actually ships as IVFPQ: PQ
   * codes quantize the RESIDUAL v − c(cell), not the raw vector.
   * Residuals concentrate near zero once the coarse quantizer has
   * soaked up the between-cell variance, so the same m×ks code budget
   * spends its resolution where the vectors actually are — tighter
   * ADC approximations than n8's raw-vector codes at identical scan
   * cost. Layout = n8's (centroids / codebooks / cell-partitioned
   * codes / float rerank table); codes rows carry the TRUE ‖v‖² so
   * the ADC cosine's denominator is exact rather than reconstructed.
   */
  def buildIvfRpqIndexWith(corpus: DataFrame, path: String, dim: Int,
      centroids: Seq[(Int, Seq[Float])],
      rcodebooks: Seq[Seq[(Int, Seq[Float])]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toDF("cell", "center")
      .write.mode("overwrite").parquet(s"$path/centroids")
    rcodebooks.zipWithIndex
      .flatMap { case (cb, s0) => cb.map { case (i, c) => (s0, i, c) } }
      .toDF("sub", "code", "center")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    val resid = cellResiduals(assignCells(corpus, centroids), centroids)
      .select(col("vec_id"), col("_resid").as("embedding"), col("cell"),
        dot(col("embedding"), col("embedding")).as("_vn2"))
    pqEncode(resid, rcodebooks, dim, keep = Seq("cell", "_vn2"))
      .drop("_rn2").withColumnRenamed("_vn2", "_rn2")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    corpus.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$path/fcorpus")
  }

  /** The residual fit: codebooks trained on v − c(cell) (deterministic
   * given corpus + seed, like every other fit here). */
  def fitResidualPqCodebooks(corpus: DataFrame, dim: Int,
      centroids: Seq[(Int, Seq[Float])], m: Int = 8, ks: Int = 16)
      : Seq[Seq[(Int, Seq[Float])]] =
    fitPqCodebooks(
      cellResiduals(assignCells(corpus, centroids), centroids)
        .select(col("vec_id"), col("_resid").as("embedding")),
      dim, m, ks)

  /**
   * Probe-pruned residual-ADC serving: per probed (query, cell) the
   * ADC dot is dot(q, c_cell) + Σ_sub table[code] — the cell term
   * re-adds what the residual encoding subtracted — over the same
   * partition-pruned m-byte code scan as [[ivfPqTopK]], then the
   * exact float rerank of k·rerankFactor survivors per query.
   */
  def ivfRpqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int, rerankFactor: Int = 3): DataFrame = {
    val centroids = loadIvfCentroids(spark, path)
    val codebooks = loadPqCodebooks(spark, path)
    val m = codebooks.size
    val dsub = codebooks.head.head._2.size
    val cents: Seq[Seq[Float]] = centroids.sortBy(_._1).map(_._2)
    val qcells = probeCells(queries, centroids, nProbe)
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qTableCols = codebooks.zipWithIndex.map { case (cb, s0) =>
      val qsl = slice(col("embedding"), s0 * dsub + 1, dsub)
      array(cb.sortBy(_._1).map { case (_, c) => dot(qsl, typedLit(c)) }: _*)
        .as(s"_qt$s0")
    }
    val probes = qcells.select(col("query_id"), col("cell"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding"))),
        Seq("query_id"))
      .select(Seq(col("query_id"), col("cell"),
        dot(col("embedding"), element_at(typedLit(cents), col("cell") + 1)).as("_qc"),
        sqrt(dot(col("embedding"), col("embedding"))).as("_qn")) ++ qTableCols: _*)
    val adc = (col("_qc") +: (0 until m)
      .map(s0 => element_at(col(s"_qt$s0"), col(s"_c$s0") + 1))).reduce(_ + _)
    val denom = col("_qn") * sqrt(col("_rn2"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id"))
    val cands = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probedCells: _*))
      .withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_cos",
        round(when(denom === 0, lit(0.0)).otherwise(adc / denom), 6))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(spark.read.parquet(s"$path/fcorpus")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Index build against caller-provided fits (reuse fits shared with
   * other indexes instead of re-running KMeans). */
  def buildIvfPqIndexWith(corpus: DataFrame, path: String, dim: Int,
      centroids: Seq[(Int, Seq[Float])],
      codebooks: Seq[Seq[(Int, Seq[Float])]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toDF("cell", "center")
      .write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex
      .flatMap { case (cb, s0) => cb.map { case (i, c) => (s0, i, c) } }
      .toDF("sub", "code", "center")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    pqEncode(assignCells(corpus, centroids), codebooks, dim, keep = Seq("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    corpus.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$path/fcorpus")
  }

  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Seq[(Int, Seq[Float])]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/codebooks")
      .select(col("sub"), col("code"), col("center"))
      .as[(Int, Int, Seq[Float])].collect().toSeq
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.map(r => (r._2, r._3)).sortBy(_._1) }
  }

  /**
   * Serve top-k from a persisted IVF-PQ index: probe `nProbe` cells
   * (partition-pruned scan of the CODES table — m bytes per corpus
   * row), score candidates with ADC lookup tables exactly as
   * [[pqTopK]] (per-query m·ks dots, broadcast; scoring a row is m
   * array lookups + m−1 adds), then rerank the k·rerankFactor
   * survivors per query with exact float cosine via an id join
   * against `fcorpus`. Output: (query_id, neighbor_id, cosine, rank)
   * — exact cosines, the same contract as every other ANN path.
   */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int, rerankFactor: Int = 3): DataFrame = {
    val centroids = loadIvfCentroids(spark, path)
    val codebooks = loadPqCodebooks(spark, path)
    val m = codebooks.size
    val dsub = codebooks.head.head._2.size
    val qcells = probeCells(queries, centroids, nProbe)
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qTableCols = codebooks.zipWithIndex.map { case (cb, s0) =>
      val qsl = slice(col("embedding"), s0 * dsub + 1, dsub)
      array(cb.sortBy(_._1).map { case (_, c) => dot(qsl, typedLit(c)) }: _*)
        .as(s"_qt$s0")
    }
    val q = queries.select(
      Seq(col("vec_id").as("query_id"),
        sqrt(dot(col("embedding"), col("embedding"))).as("_qn")) ++ qTableCols: _*)
    val probes = qcells.select(col("query_id"), col("cell")).join(q, Seq("query_id"))
    val adc = (0 until m)
      .map(s0 => element_at(col(s"_qt$s0"), col(s"_c$s0") + 1))
      .reduce(_ + _)
    val denom = col("_qn") * sqrt(col("_rn2"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id"))
    val cands = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probedCells: _*))
      .withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_cos",
        round(when(denom === 0, lit(0.0)).otherwise(adc / denom), 6))
      .withColumn("_ar", row_number().over(wA))
      .filter(col("_ar") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cands)
      .join(spark.read.parquet(s"$path/fcorpus")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))),
        Seq("query_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /**
   * LSH-bucketed ANN: corpus bucketed by hyperplane signature; each
   * query probes its own bucket only (single equi-join on the bucket
   * key — at scale this is the difference between a full scan per query
   * and a hash-partition lookup). Recall < 1 by construction; raise
   * `planes` for smaller/purer buckets or lower it for higher recall.
   * Output: (query_id, neighbor_id, cosine, rank).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 8, multiProbe: Boolean = false): DataFrame = {
    def sig(c: Column) = Dedup.hyperplaneSignature(c, dim, planes)
    val bucketed = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_cv"), sig(col("embedding")).as("_sig"))
    // multi-probe: each query also visits the `planes` buckets at
    // Hamming distance 1 from its own (one sign bit flipped) — the
    // standard recall lever that costs probes, not an extra corpus
    // pass: the query side stays broadcast-sized (|Q| × (planes+1)).
    val probeSigs =
      if (!multiProbe) array(sig(col("embedding")))
      else array(sig(col("embedding")) +:
        (0 until planes).map(p => sig(col("embedding")).bitwiseXOR(lit(1L << p))): _*)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("_qv"), explode(probeSigs).as("_sig"))
      .withColumn("_qn", norm(col("_qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // norms per ROW before the bucket join (cosineWithNorms)
    bucketed.withColumn("_cn", norm(col("_cv"))).join(q, Seq("_sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineWithNorms(
        col("_cv"), col("_qv"), col("_cn"), col("_qn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
