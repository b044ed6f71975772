package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic mergeable HyperLogLog (Flajolet et al. 2007) — the
 * sketch-store primitive a 100 TB warehouse needs for incremental
 * distinct counting: build one small fixed-size sketch per partition
 * (day, source, shard), STORE the sketch bytes, and answer
 * "distinct over any partition union" by register-max merge — no
 * rescan, no shuffle of raw values. Spark ships
 * `approx_count_distinct` (also HLL) but does not expose its sketch
 * for storage/merge across queries; this pair does, the
 * datasketches shape.
 *
 * Engine-portability is a design constraint like everywhere else in
 * graft: the hash is md5 (not Spark's xxhash), the register index is
 * the top [[HllSketch.P]] bits of the digest and the rank is the
 * leading-zero count of the next [[HllSketch.W]] bits — all integer
 * arithmetic a DuckDB oracle reproduces bit-for-bit (hex-nibble fold,
 * `bin()` length; see the h1/h2 oracle SQL). The estimate uses the
 * standard bias-corrected harmonic mean with linear counting below
 * 2.5·m; both branches are arranged so every FP operation is either
 * an exact integer in double, a power-of-two scale, or a single IEEE
 * division — cross-engine exact (ln appears only via per-V literals
 * on the oracle side, computed with this JVM's Math.log).
 *
 * Scale shape: the aggregation buffer is a fixed 2^P = 1024-byte
 * array regardless of input size; update is one md5 + O(1); merge is
 * a 1024-byte max. Registers cap at W+1, so the harmonic sum
 * Σ 2^(W+1−M[j]) ≤ 2^51 stays an EXACT integer (and exact in double)
 * — partition order can never flip an ulp.
 */
object HllSketch {
  /** Register-index bits: m = 2^P = 1024 registers (~3.2 % std err). */
  val P = 10
  val M: Int = 1 << P
  /** Rank-window bits (bits P .. P+W−1 of the digest). */
  val W = 40
  /** Max register value: all-zero window ⇒ W+1. */
  val RankCap: Int = W + 1

  /** alpha_m · m² · 2^(W+1) — the raw-estimate numerator, frozen once
   * so Spark eval and the generated oracle share ONE double. */
  val AlphaNumerator: Double =
    (0.7213 / (1.0 + 1.079 / M)) * M.toDouble * M.toDouble * math.pow(2.0, RankCap)

  /** Linear-counting threshold (2.5·m). */
  val LinearThreshold: Double = 2.5 * M

  /** (register index, rank) of one value's md5. Exposed for the spec's
   * independent cross-check. */
  def indexAndRank(bytes: Array[Byte]): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    // first 52 bits of the digest, hex-nibble big-endian (what the
    // oracle's 13-hex-char fold reads)
    var hv = 0L
    var i = 0
    while (i < 7) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
    hv = hv >>> 4
    val idx = (hv >>> (52 - P)).toInt
    val w = (hv >>> 2) & ((1L << W) - 1L)
    val rank = if (w == 0L) RankCap else RankCap - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (idx, rank)
  }

  /** (zero registers, exact harmonic sum Σ 2^(RankCap−M[j]),
   * estimate) of a register array. */
  def stats(regs: Array[Byte]): (Int, Long, Double) = {
    var v = 0
    var s = 0L
    var j = 0
    while (j < M) {
      val r = regs(j) & 0xff
      if (r == 0) v += 1
      s += 1L << (RankCap - r)
      j += 1
    }
    val estRaw = AlphaNumerator / s.toDouble
    val est =
      if (v > 0 && estRaw <= LinearThreshold) M.toDouble * math.log(M.toDouble / v)
      else estRaw
    (v, s, est)
  }
}

/**
 * Aggregate: STRING values → 1024-byte HLL register array (BINARY).
 * Nulls are skipped. The buffer IS the serialized form.
 */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs a STRING child (cast explicitly — the formatting IS the hash input), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (idx, rank) = HllSketch.indexAndRank(v.asInstanceOf[UTF8String].getBytes)
      if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < HllSketch.M) {
      if ((b(j) & 0xff) > (a(j) & 0xff)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "hll_sketch"
}

/**
 * Aggregate: BINARY sketches → their register-max union (BINARY).
 * Null sketches are skipped; merging sketches of mismatched size is a
 * corrupt-store error and throws.
 */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge needs a BINARY sketch child, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = v.asInstanceOf[Array[Byte]]
      require(sk.length == HllSketch.M,
        s"hll_merge: sketch of ${sk.length} bytes, expected ${HllSketch.M} — corrupt store?")
      merge(buf, sk)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < HllSketch.M) {
      if ((b(j) & 0xff) > (a(j) & 0xff)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "hll_merge"
}

/**
 * Scalar: BINARY sketch → struct(v INT, s BIGINT, estimate DOUBLE) —
 * zero-register count, the exact integer harmonic sum, and the
 * corrected estimate. CodegenFallback is deliberate: this evaluates
 * once per GROUP (sketch row), never per input row, so it sits
 * outside the hot path by construction.
 */
case class HllStats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_stats needs a BINARY sketch child, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("v", IntegerType, nullable = false),
    StructField("s", LongType, nullable = false),
    StructField("estimate", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val sk = input.asInstanceOf[Array[Byte]]
    require(sk.length == HllSketch.M,
      s"hll_stats: sketch of ${sk.length} bytes, expected ${HllSketch.M}")
    val (v, s, est) = HllSketch.stats(sk)
    InternalRow(v, s, est)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hll_stats"
}
