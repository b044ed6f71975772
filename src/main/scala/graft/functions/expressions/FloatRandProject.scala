package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/**
 * Codegen'd ±1 random projection of an Array[Float] column (the n9
 * JL reduction): out[j] = Σ_i sign(j,i)·v[i], accumulated in double
 * in index order, each output cast to float — bit-identical to the
 * `array((0 until dimOut).map(j => terms.reduceLeft(_ + _)))`
 * composition it replaces, so the static SQL oracle is unaffected.
 *
 * Why an Expression: the composed form is a 1024-node tree (16 dims ×
 * 64 element_at terms) that blows past the JIT's method-size sweet
 * spot and drags the candidate stage out of efficient codegen —
 * measured 3.3 s for n9 at sf0.1 where every sibling ANN query runs
 * sub-second. A tight loop over a referenced sign table keeps the
 * stage compiled and the expression tree constant-size.
 *
 * The sign matrix comes from [[graft.functions.Similarity.rademacherSign]]
 * (md5-seeded, engine-reproducible) and rides along as a reference
 * object, never as literals in the generated source.
 *
 * Null semantics: null if the array is null; null ELEMENTS contribute
 * 0 (same stance as [[FloatVecDot]] — embeddings are dense).
 */
case class FloatRandProject(child: Expression, dimIn: Int, dimOut: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FloatRandProject needs an array<float> input, got $t")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  @transient private lazy val signs: Array[Byte] =
    Array.tabulate(dimOut * dimIn) { k =>
      graft.functions.Similarity.rademacherSign(k / dimIn, k % dimIn).toByte
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dimIn, v.numElements())
    val out = new Array[Float](dimOut)
    var j = 0
    while (j < dimOut) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += signs(j * dimIn + i) * v.getFloat(i).toDouble
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($dimIn, $v.numElements());
         |float[] $out = new float[$dimOut];
         |for (int $j = 0; $j < $dimOut; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      $acc += $signsRef[$j * $dimIn + $i] * ((double) $v.getFloat($i));
         |    }
         |  }
         |  $out[$j] = (float) $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
