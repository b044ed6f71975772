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
    val joined = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
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
      planes: Int = 8): DataFrame = {
    def sig(c: Column) = Dedup.hyperplaneSignature(c, dim, planes)
    val bucketed = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_cv"), sig(col("embedding")).as("_sig"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("_qv"), sig(col("embedding")).as("_sig")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    bucketed.join(q, Seq("_sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("_cv"), col("_qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
