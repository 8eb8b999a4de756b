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

  /** Decompose a boolean Column into the v1 filters its pushable conjuncts
    * denote — only attribute-vs-literal comparisons under AND translate;
    * anything else (OR trees, computed sides, functions) contributes
    * nothing, so callers prune conservatively, never wrongly. Spark 4
    * builds unresolved Columns as `internal.ColumnNode` trees
    * (UnresolvedFunction("and"/"<"/"="/...) over UnresolvedAttribute and
    * external-valued internal.Literal), so the walk happens on the NODE
    * tree; a resolved Column (df("x") < 1) falls back to the catalyst walk.
    */
  def pushableConjuncts(c: Column): Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NodeLit, UnresolvedAttribute => NodeAttr, UnresolvedFunction => NodeFn}
    import org.apache.spark.sql.{sources => f}
    def nAttr(n: ColumnNode): Option[String] = n match {
      case a: NodeAttr if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }
    def nLit(n: ColumnNode): Option[Any] = n match {
      case l: NodeLit if l.value != null => Some(l.value)
      case _ => None
    }
    def comparison(name: String, l: Option[String], lv: Option[Any],
        r: Option[String], rv: Option[Any]): Seq[f.Filter] = {
      def both(mk: (String, Any) => f.Filter, flip: (String, Any) => f.Filter): Seq[f.Filter] =
        (l, rv, r, lv) match {
          case (Some(a), Some(v), _, _) => Seq(mk(a, v))
          case (_, _, Some(a), Some(v)) => Seq(flip(a, v))
          case _ => Seq.empty
        }
      name match {
        case "=" | "==" => both(f.EqualTo, f.EqualTo)
        case "<" => both(f.LessThan, f.GreaterThan)
        case "<=" => both(f.LessThanOrEqual, f.GreaterThanOrEqual)
        case ">" => both(f.GreaterThan, f.LessThan)
        case ">=" => both(f.GreaterThanOrEqual, f.LessThanOrEqual)
        case _ => Seq.empty
      }
    }
    def walkNode(n: ColumnNode): Seq[f.Filter] = n match {
      case fn: NodeFn if fn.functionName.equalsIgnoreCase("and") && fn.arguments.length == 2 =>
        walkNode(fn.arguments(0)) ++ walkNode(fn.arguments(1))
      case fn: NodeFn if fn.arguments.length == 2 =>
        val (l, r) = (fn.arguments(0), fn.arguments(1))
        comparison(fn.functionName, nAttr(l), nLit(l), nAttr(r), nLit(r))
      case _ => Seq.empty
    }
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def eAttr(e: ce.Expression): Option[String] = e match {
      case a: ce.Attribute => Some(a.name)
      case _ => None
    }
    def eLit(e: ce.Expression): Option[Any] = e match {
      case ce.Literal(v, _) if v != null => Some(v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other
      })
      case _ => None
    }
    def walkExpr(e: ce.Expression): Seq[f.Filter] = e match {
      case ce.And(l, r) => walkExpr(l) ++ walkExpr(r)
      case b: ce.BinaryComparison =>
        val name = b match {
          case _: ce.EqualTo => "="
          case _: ce.LessThan => "<"
          case _: ce.LessThanOrEqual => "<="
          case _: ce.GreaterThan => ">"
          case _: ce.GreaterThanOrEqual => ">="
          case _ => ""
        }
        comparison(name, eAttr(b.left), eLit(b.left), eAttr(b.right), eLit(b.right))
      case _ => Seq.empty
    }
    val viaNode = scala.util.Try(walkNode(c.node)).getOrElse(Seq.empty)
    if (viaNode.nonEmpty) viaNode
    else scala.util.Try(walkExpr(expression(c))).getOrElse(Seq.empty)
  }
}
