package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Codegen'd dot product over two vector columns — each side
 * Array[Float] or Array[Double] — accumulated in double in index order
 * (bit-identical to the sequential `aggregate(zip_with(...))`
 * formulation it replaces, so the DuckDB oracles are unaffected).
 * The double side exists for DOUBLE-precision centroid literals
 * ([[graft.functions.Similarity.kmeansFit]]'s iterated centroids are
 * `round(x, 6)` doubles that a float cast would corrupt).
 *
 * This is the one hot scalar in the similarity/dedup family — the
 * higher-order-function formulation is interpreted per element (no
 * whole-stage codegen for lambda functions), which made cosine
 * verification the bottleneck of LSH near-dup at bench scale. A ~30-line
 * custom Expression keeps the whole pipeline inside codegen.
 *
 * Null semantics: null if either array is null; null ELEMENTS contribute
 * 0 (embeddings are dense; mirrors zip_with's null-product → aggregate
 * skip in practice for our non-null data).
 */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"FloatVecDot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lx = isDouble(left.dataType)
    val ly = isDouble(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lx) x.getDouble(i) else x.getFloat(i).toDouble
        val yv = if (ly) y.getDouble(i) else y.getFloat(i).toDouble
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, dbl: Boolean) =
      if (dbl) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, i, isDouble(left.dataType))} * ${get(b, i, isDouble(right.dataType))};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
