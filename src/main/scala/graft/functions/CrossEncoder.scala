package graft.functions

/**
 * Pluggable cross-encoder rerank seam — the second-stage scorer of a
 * production retrieval stack: first-stage retrieval (BM25 / ANN /
 * their RRF fusion — the r1–r9 family) nominates a small candidate
 * set per query, then a JOINT model scores each (query, document)
 * PAIR and reorders the survivors. Unlike the bi-encoder
 * [[EmbeddingModel]] (one vector per side, similarity in vector
 * space), a cross-encoder sees both texts in one forward pass, which
 * is why it cannot be pre-indexed and only ever runs on the
 * candidates a cheaper stage already chose.
 *
 * The interface mirrors [[EmbeddingModel]]'s ONNX-Runtime-shaped
 * lifecycle on purpose: a real deployment wraps an `OrtSession`
 * created once per executor partition from model bytes, fed
 * (query, doc) token batches, one score per pair back per `run()`.
 * The inference libraries are absent in this environment, so the
 * shipped implementation is [[HashOverlapCrossEncoder]] — a
 * deterministic stand-in with the same contract (batched calls,
 * per-partition load, close-on-task-end) whose arithmetic is exact
 * integers, so an engine-portable oracle can replay it (the
 * HashProjectionModel discipline).
 *
 * Scale shape: the model loads ONCE per partition and scores only
 * queries × k candidate pairs — corpus size never enters; the
 * candidate join broadcasts the (tiny) fused top-k against the doc
 * table so document text reaches the scorer without a corpus
 * shuffle.
 */
trait CrossEncoder extends AutoCloseable {
  def name: String
  /** Preferred pairs per [[scoreBatch]] call (tensor batch size). */
  def maxBatch: Int
  /** One joint forward pass: each pair is (query terms, document
   * tokens), result is one micro-score per pair, row-aligned. Must be
   * deterministic for a given pair independent of batch composition
   * (required so results are partitioning-invariant). */
  def scoreBatch(pairs: Array[(Array[String], Array[String])]): Array[Long]
  /** Release session/native resources (invoked at task completion). */
  override def close(): Unit = ()
}

/** What ships to executors: a small serializable factory, NOT the
 * model (a real session holds native handles). Invoked once per
 * partition. */
trait CrossEncoderLoader extends Serializable {
  def load(): CrossEncoder
}

/**
 * Deterministic reference cross-encoder: score(q, d) =
 * Σ_{t ∈ distinct(q)} w(seed, t) · min(tf_d(t), [[HashOverlapCrossEncoder.TfCap]]) —
 * a seeded term-overlap model (weights md5-derived from (seed, term),
 * identical on every executor with nothing broadcast; the saturated
 * tf is the BM25-ish diminishing-returns shape). All-integer, so the
 * oracle replays it exactly: w = (first 8 md5 hex chars of
 * "ce:seed:term" as unsigned int) mod 2²⁰ + 1 — the same
 * hex-digit-sum idiom every md5-derived oracle constant uses.
 */
object HashOverlapCrossEncoder {
  /** Saturation cap on a term's in-document frequency contribution. */
  val TfCap = 3
  /** Weight range modulus (weights fall in [1, 2²⁰]). */
  val WeightMod = 1048576L

  /** The (seed, term) weight — exposed so the oracle can reproduce
   * the identical value from the term string in SQL. */
  def weightOf(seed: Long, term: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ce:$seed:$term".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % WeightMod + 1
  }
}

final case class HashOverlapCrossEncoder(seed: Long, maxBatch: Int = 64)
    extends CrossEncoder {
  require(maxBatch > 0, s"maxBatch must be positive, got $maxBatch")
  val name = s"hash-overlap-$seed"

  // weight memo — the analogue of a real session's resident weights;
  // bounded by the vocabulary the partition's queries actually use
  private val wMemo = new java.util.HashMap[String, java.lang.Long]()
  private def w(t: String): Long = {
    var v = wMemo.get(t)
    if (v == null) {
      v = java.lang.Long.valueOf(HashOverlapCrossEncoder.weightOf(seed, t))
      wMemo.put(t, v)
    }
    v.longValue()
  }

  def scoreBatch(pairs: Array[(Array[String], Array[String])]): Array[Long] =
    pairs.map { case (qTerms, docToks) =>
      val qset = new java.util.HashSet[String]()
      qTerms.foreach(qset.add)
      if (qset.isEmpty) 0L
      else {
        // tf restricted to query terms — the only counts the score uses
        val tf = new java.util.HashMap[String, Integer]()
        docToks.foreach { t =>
          if (qset.contains(t)) {
            val c = tf.get(t)
            tf.put(t, if (c == null) 1 else c.intValue() + 1)
          }
        }
        var s = 0L
        val it = qset.iterator()
        while (it.hasNext) {
          val t = it.next()
          val c = tf.get(t)
          if (c != null)
            s += w(t) * math.min(c.intValue(), HashOverlapCrossEncoder.TfCap)
        }
        s
      }
    }
}

final case class HashOverlapCrossLoader(seed: Long, maxBatch: Int = 64)
    extends CrossEncoderLoader {
  def load(): CrossEncoder = HashOverlapCrossEncoder(seed, maxBatch)
}
