package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API (ExpressionUtils is private[sql] in Spark 4). */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazy wrapper (ColumnNodeExpression) — resolved only when planted
    * inside a DataFrame operation. NOT usable from a FunctionRegistry
    * builder; use [[toExpression]] there. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a Column's node tree into a real Catalyst
    * expression (the same converter DataFrame analysis applies).
    * Required when an expression must stand on its own — e.g. returned
    * from a SQL FunctionRegistry builder, where the analyzer never
    * re-visits a lazy ColumnNodeExpression wrapper. */
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
