package graft

import graft.functions.expressions.FloatVecDot
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions: registers graft's custom Catalyst expressions
 * for SQL callers. Install via
 * `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`; for an already-running
 * session use [[GraftExtensions.registerTemp]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq((
    new FunctionIdentifier("float_vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "float_vec_dot(a, b) takes two array<float> arguments")
      FloatVecDot(exprs.head, exprs(1))
    }))

  /** Register into a live session (getOrCreate ignores withExtensions
   * when a session already exists). */
  def registerTemp(spark: SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
