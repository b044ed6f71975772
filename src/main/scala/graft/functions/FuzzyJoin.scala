package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate string matching (entity resolution) — find all pairs of
 * strings within a small edit distance, WITHOUT comparing all pairs.
 * The reference keys every lookup on exact ids
 * (machine-downtime-monitor-on-aws `query-data.ts` — `machineId`
 * equality); a large-scale training-data pipeline additionally needs
 * the fuzzy form: near-identical record keys (OCR noise, typos,
 * inconsistent serials) that exact joins miss and that feed the same
 * dedup machinery once linked.
 *
 * Method: FastSS deletion neighborhoods (Bocek, Hunt, Stiller 2007,
 * "Fast Similarity Search in Large Dictionaries" — public knowledge).
 * For k = 1: two strings are within edit distance 1 **only if** their
 * deletion neighborhoods (the string plus every single-character
 * deletion) intersect — substitution shares the key with the differing
 * character deleted from both sides, insertion/deletion shares the
 * shorter string itself. The converse does not hold (shared keys can
 * sit at distance 2), so candidates are verified with the exact
 * `levenshtein` built-in — candidate generation is a recall-complete
 * filter, verification restores precision. The same candidate/verify
 * split as [[Dedup.minhashDedupPairs]], but here the candidate step
 * is EXACT-recall by construction (a theorem, not a probability).
 *
 * Scale shape (the part that must survive 100 TB):
 *  - candidates come from an equi-join on deletion keys, NEVER string
 *    × string: |keys| = Σ(len+1) ≈ mean-length × |vocab|, and the
 *    join shuffles short strings hash-partitioned by key;
 *  - the verify step runs only on candidate pairs (codegen'd
 *    `levenshtein`, exact integer — nothing environment-sensitive);
 *  - `minLen` (default 4) is the skew guard: deletion keys of very
 *    short strings are hubs (every 2-char string shares single-char
 *    keys with dozens of neighbors) and edit distance 1 on a 2-char
 *    key is not a meaningful match anyway — the [[Dedup]]
 *    `maxShingleFreq` lesson applied to neighborhoods;
 *  - for heavy-tailed key distributions an optional `maxKeyFreq` cap
 *    drops hub keys outright — pairs reachable ONLY through a dropped
 *    hub are missed (a documented recall cap, d2's contract), so the
 *    default (None) keeps exact semantics.
 *
 * k ≥ 2 generalizes by taking neighborhoods of up to k deletions
 * (O(lenᵏ) keys per string) with the identical join+verify shape; the
 * implementation ships k = 1, the overwhelmingly common linkage radius
 * for key-like strings.
 */
object FuzzyJoin {

  /** Deletion neighborhood of a string for k = 1: the string itself
   * plus every single-character deletion, deduplicated (deleting any
   * character of a run yields one key). Pure codegen'd expression —
   * no UDF. */
  def deletionKeys(s: Column): Column =
    array_union(
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s)))),
      array(s))

  /** Deletion neighborhood for k = 2: [[deletionKeys]] plus every
   * two-character deletion (positions i < j), deduplicated. O(len²/2)
   * keys per string — the FastSS key-count/radius tradeoff. The
   * length guard matters: Spark's `sequence(1, 0)` is DESCENDING, so
   * the pair loop must not run on strings shorter than 2. */
  def deletionKeys2(s: Column): Column =
    array_union(
      deletionKeys(s),
      when(length(s) >= 2, array_distinct(flatten(
        transform(sequence(lit(1), length(s) - lit(1)), i =>
          transform(sequence(i + lit(1), length(s)), j =>
            concat(s.substr(lit(1), i - lit(1)),
              s.substr(i + lit(1), j - i - lit(1)),
              s.substr(j + lit(1), length(s))))))))
        .otherwise(array(s)))

  /**
   * All unordered pairs of distinct values of `strCol` within edit
   * distance 1. Output: (left_str, right_str) with left_str <
   * right_str — fully deterministic, no scores, no floats. Input rows
   * are deduplicated on the string value first (linkage is a property
   * of the value, not the row); strings shorter than `minLen` are
   * excluded (skew guard + match quality, see object doc).
   */
  def editDistance1Pairs(strs: DataFrame, strCol: String, minLen: Int = 4,
      maxKeyFreq: Option[Long] = None): DataFrame =
    editDistancePairs(strs, strCol, maxDist = 1, minLen, maxKeyFreq)

  /**
   * [[editDistance1Pairs]] generalized to radius `maxDist` ∈ {1, 2}:
   * neighborhoods of up to `maxDist` deletions (recall-complete for
   * ed ≤ maxDist — each edit op deletes at most one character from
   * each side of the alignment), candidates equi-joined on the keys,
   * verified with the thresholded `levenshtein`. Output shape is
   * identical ((left_str, right_str), left < right). Radius 2 pays
   * O(len²/2) keys per string and denser candidate buckets — raise
   * `minLen` (short strings within two edits of each other are mostly
   * noise) and consider `maxKeyFreq` on hub-prone keyspaces.
   */
  def editDistancePairs(strs: DataFrame, strCol: String, maxDist: Int,
      minLen: Int = 4, maxKeyFreq: Option[Long] = None): DataFrame =
    editDistancePairsWithPayload(strs, strCol, Nil, maxDist, minLen, maxKeyFreq)

  /**
   * [[editDistancePairs]] carrying per-string PAYLOAD columns through
   * the candidate join: output rows are
   * (left_str, right_str, l_&lt;p&gt;…, r_&lt;p&gt;…) with both sides'
   * payload attached. This is the memo-building form for
   * entity-resolution agreement gates — the attributes the gate needs
   * ride the SAME deletion-key shuffle the candidates already pay
   * (one narrow map-side widening), so downstream gating is a FILTER
   * on the pair table instead of re-joining the (potentially 10⁷-row)
   * pair memo against the full record table once per side per run —
   * the re-join was measured to dominate the 100× ER closure
   * (SCALE.md round 15: two 39.75M-pair × 1.5M-name joins per run).
   *
   * Precondition: payload columns are FUNCTIONALLY DETERMINED by the
   * string value (true for key-like strings — one record per key). A
   * string occurring with two payload tuples would survive the input
   * dedup twice and emit duplicate pairs differing only in payload.
   */
  def editDistancePairsWithPayload(strs: DataFrame, strCol: String,
      payload: Seq[String], maxDist: Int,
      minLen: Int = 4, maxKeyFreq: Option[Long] = None): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    maxKeyFreq.foreach(m => require(m >= 2, s"maxKeyFreq must be >= 2, got $m"))
    val keyFn: Column => Column =
      if (maxDist == 1) deletionKeys else deletionKeys2
    val v = strs.select(col(strCol).cast("string").as("s") +: payload.map(col): _*)
      .filter(col("s").isNotNull && length(col("s")) >= minLen)
      .distinct()
    val keysAll = v.select(
      (col("s") +: payload.map(col)) :+ explode(keyFn(col("s"))).as("k"): _*)
    // hub-key cap (optional): drop keys shared by more than maxKeyFreq
    // strings BEFORE the self-join — same window-count shape as
    // Dedup's shingle-frequency cap, same documented recall tradeoff
    val keys = maxKeyFreq.fold(keysAll) { m =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
      keysAll.withColumn("_kf", count(lit(1)).over(w))
        .filter(col("_kf") <= m).drop("_kf")
    }
    val outCols =
      Seq(col("a.s").as("left_str"), col("b.s").as("right_str")) ++
        payload.map(p => col(s"a.$p").as(s"l_$p")) ++
        payload.map(p => col(s"b.$p").as(s"r_$p"))
    val cand = keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.s") < col("b.s"))
      .select(outCols: _*)
      .distinct()
    cand.filter(levenshtein(col("left_str"), col("right_str"), maxDist) >= 0)
  }

  /** The verify predicate: edit distance ≤ 1, evaluated with the
   * THRESHOLDED levenshtein (returns −1 past the bound) — banded DP,
   * O(len) per candidate instead of the full O(len²) matrix. The
   * verify is the fuzzy family's hot inner loop (runs once per
   * candidate pair), so the band matters at scale; results are
   * pinned identical to the unthresholded form by the brute-force
   * parity tests. */
  private def ed1(l: Column, r: Column): Column =
    levenshtein(l, r, 1) >= 0

  /**
   * Sorted-neighborhood blocking (Hernández & Stolfo 1995 — the other
   * classic ER candidate generator): sort the distinct strings, pair
   * each with its next `window` successors, verify with exact
   * `levenshtein`. Output shape identical to [[editDistance1Pairs]]
   * (left_str < right_str holds because rank order IS lexicographic
   * order).
   *
   * Unlike the deletion-neighborhood join, SNM's recall is NOT
   * complete — it only sees edits that keep the pair within `window`
   * sort positions (suffix-ish edits on a shared prefix), which is
   * why production SNM runs multiple passes under different sort
   * keys. It earns its place as the cheap generator: O(|V|·window)
   * candidates with NO key explosion, and the d21 eval measures
   * exactly what that cheapness costs (18% single-pass recall on the
   * serial-key corpus at sf0.01).
   *
   * Scale shape: the sort is [[GlobalRank.withGlobalRank]]'s
   * range-partitioned two-pass (no single-partition Window); the
   * neighbor pairing is an EQUI-join on exploded rank offsets
   * (rank + 1 … rank + window), never a range join.
   */
  def sortedNeighborhoodPairs(strs: DataFrame, strCol: String,
      window: Int = 3, minLen: Int = 4): DataFrame =
    sortedNeighborhoodPairsBy(strs, strCol, identity, window, minLen)

  /**
   * [[sortedNeighborhoodPairs]] under an arbitrary SORT KEY — the
   * primitive multi-pass SNM is built from. `sortKey` maps the string
   * column to the ordering expression (identity = classic
   * lexicographic SNM); rank ties break on the string itself, so the
   * order is total and the pass is deterministic. Output is
   * orientation-normalized ((left_str, right_str), left < right) so
   * pass results union cleanly regardless of where the key put each
   * string in the sort.
   */
  def sortedNeighborhoodPairsBy(strs: DataFrame, strCol: String,
      sortKey: Column => Column, window: Int = 3, minLen: Int = 4): DataFrame =
    sortedNeighborhoodPairsWithOffsetBy(strs, strCol, sortKey, window, minLen)
      .drop("off")

  /**
   * [[sortedNeighborhoodPairsBy]] keeping each verified pair's RANK
   * DISTANCE under this pass's sort order (`off` ∈ [1, window]) — the
   * window-sweep primitive: a pair found at rank distance o is found
   * by exactly the windows w ≥ o, so ONE w = maxWindow pass serves
   * every smaller window as an `off ≤ w` filter. That turns the
   * (passes × windows) cost/recall frontier (`d23_snm_frontier`) into
   * passes-many SNM joins instead of passes × windows — the sweep
   * costs what the widest window costs.
   */
  def sortedNeighborhoodPairsWithOffsetBy(strs: DataFrame, strCol: String,
      sortKey: Column => Column, window: Int = 3, minLen: Int = 4): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val v = strs.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= minLen)
      .distinct()
    val ranked = GlobalRank.withGlobalRank(
      v, Seq(sortKey(col("s")), col("s")), "_r").select(col("s"), col("_r"))
    val probes = ranked.select(col("s").as("_sa"), col("_r").as("_ra"),
      explode(sequence(col("_r") + 1, col("_r") + window)).as("_rr"))
    probes.join(ranked.select(col("s").as("_sb"), col("_r").as("_rr")),
        Seq("_rr"))
      .filter(ed1(col("_sa"), col("_sb")))
      .select(least(col("_sa"), col("_sb")).as("left_str"),
        greatest(col("_sa"), col("_sb")).as("right_str"),
        (col("_rr") - col("_ra")).cast("int").as("off"))
  }

  /** The half-rotation sort key: second half of the string ahead of
   * the first (`substr(s, ⌊len/2⌋+1) || substr(s, 1, ⌊len/2⌋)`) —
   * aligns strings whose differences sit in the FIRST half, the edits
   * both the identity and reversed keys scatter. */
  def halfRotation(s: Column): Column = {
    val h = (length(s) / lit(2)).cast("int")
    concat(s.substr(h + lit(1), length(s)), s.substr(lit(1), h))
  }

  /** The classic multi-pass key set (Hernández & Stolfo 1995 run SNM
   * several times under rotated keys precisely because one
   * lexicographic pass only sees suffix-ish edits — the d21 lesson,
   * measured at 18% single-pass recall on serial keys): identity
   * (suffix edits on a shared prefix), reversed (prefix edits on a
   * shared suffix), half-rotation (mid/first-half edits). */
  def defaultSnmPasses: Seq[(String, Column => Column)] = Seq(
    "identity" -> identity[Column] _,
    "reverse" -> ((s: Column) => reverse(s)),
    "rotate" -> (halfRotation _))

  /**
   * Multi-pass sorted-neighborhood pairs: the union (distinct) of
   * [[sortedNeighborhoodPairsBy]] over `passes`. Still O(|V|·window)
   * candidates PER PASS with no key explosion — the cheap generator's
   * scale shape survives; recall is what the passes buy (the
   * `d22_snm_multipass` eval measures each pass and the union against
   * the FastSS-exact truth).
   */
  def multiPassSnmPairs(strs: DataFrame, strCol: String,
      window: Int = 3, minLen: Int = 4,
      passes: Seq[(String, Column => Column)] = defaultSnmPasses): DataFrame = {
    require(passes.nonEmpty, "multiPassSnmPairs needs at least one pass")
    passes.map { case (_, p) =>
      sortedNeighborhoodPairsBy(strs, strCol, p, window, minLen)
    }.reduce(_ unionByName _).distinct()
  }
}
