package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Codegen'd Z-order (Morton) key: interleave the low `bits` bits of
 * N long columns round-robin — output bit `j*N + k` is bit `j` of
 * child `k`. Clustering a table's files by this key gives every
 * participating column locality at once, so parquet row-group min/max
 * stats prune multi-dimensional predicates — the standard data-layout
 * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for 100 TB warehouses
 * where no single sort column serves all query patterns.
 *
 * Inputs are masked to `bits` bits (callers pre-bucket raw values into
 * a non-negative 0..2^bits-1 range, e.g. via `pmod`/range bucketing);
 * `N * bits` must fit in the 63 value bits of a long. Null if any
 * input is null. The bit loop lives in generated code, so the key
 * computation stays inside whole-stage codegen in the write path.
 */
case class ZOrderInterleave(children: Seq[Expression], bits: Int) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("ZOrderInterleave needs at least 2 inputs")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"ZOrderInterleave needs 1 <= bits and n*bits <= 63, got n=${children.size} bits=$bits")
    else if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ZOrderInterleave needs BIGINT inputs, got ${children.map(_.dataType).mkString(", ")}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private val mask: Long = (1L << bits) - 1L

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    var acc = 0L
    var k = 0
    while (k < n) {
      val v = children(k).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & mask
      var j = 0
      while (j < bits) {
        acc |= ((x >>> j) & 1L) << (j * n + k)
        j += 1
      }
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val acc = ctx.freshName("acc")
    val evals = children.map(_.genCode(ctx))
    val nullChecks = evals.map(e => e.isNull.toString)
    val body = evals.zipWithIndex.map { case (e, k) =>
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      s"""
         |long $x = ${e.value} & ${mask}L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  $acc |= (($x >>> $j) & 1L) << ($j * $n + $k);
         |}
       """.stripMargin
    }.mkString("\n")
    val codeStr =
      s"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = ${if (nullable) nullChecks.mkString(" || ") else "false"};
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long $acc = 0L;
         |  $body
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
      Seq(codeStr), Seq.empty))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
