package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4.x). Living under
  * the `org.apache.spark.sql` package tree grants the access; this is the
  * supported pattern for libraries registering custom Catalyst expressions
  * without going through the SQL function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Scala value of a `lit(...)` column, if it is one. Spark 4 represents
    * `lit` as a lazy `ColumnNodeExpression` over an `internal.Literal` node,
    * so matching the converted Expression against catalyst `Literal` never
    * fires — match the node instead.
    */
  def literalValue(c: Column): Option[Any] = c.node match {
    case org.apache.spark.sql.internal.Literal(v, _, _) => Some(v)
    case _ => expression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => Some(v)
      case _ => None
    }
  }
}
