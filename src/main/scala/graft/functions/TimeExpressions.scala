package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen forms of the F1/F2 time functions, so the enrichment path
  * (U1 function-valued fields) stays inside whole-stage codegen instead of
  * dropping to a Scala UDF on what is a full-corpus scan. Same kernels as
  * the UDF path ([[TimeFunctions]]) — the reference's parser quirks,
  * including throw-on-empty when `allowEmpty` is false, are preserved
  * byte-for-byte.
  */
object TimeKernels {

  /** F2 kernel over UTF8String, null-aware: null/empty input flows INTO the
    * parser because the `allowEmpty` contract decides whether it is an error
    * or a row of nulls — the expression must NOT null-propagate around it.
    */
  def isoPartsRow(s: UTF8String, tz: Int, handle: String, allowEmpty: Boolean): InternalRow = {
    val p = TimeFunctions.isoToParts(
      if (s == null) null else s.toString, tz, handle, allowEmpty)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.datetime),
      p.microseconds.map(Int.box).orNull,
      UTF8String.fromString(p.month)))
  }

  /** F1 kernel over UTF8String. */
  def normalizeIso(s: UTF8String): UTF8String =
    UTF8String.fromString(TimeFunctions.normalizeIso(s.toString))
}

object TimeExpressions {

  val isoPartsType: StructType = StructType(Seq(
    StructField("datetime", StringType),
    StructField("microseconds", IntegerType),
    StructField("month", StringType)))

  /** F2 as a native expression. Config args ride as constructor params (they
    * are literals at config-parse time). Deliberately evaluates on null
    * input — see [[TimeKernels.isoPartsRow]].
    */
  case class IsoToParts(
      child: Expression,
      expectedTz: Int,
      handleTz: String,
      allowEmpty: Boolean) extends UnaryExpression {
    override def dataType: DataType = isoPartsType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      TimeKernels.isoPartsRow(v.asInstanceOf[UTF8String], expectedTz, handleTz, allowEmpty)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      val handleRef = ctx.addReferenceObj("handleTz", handleTz, "java.lang.String")
      ev.copy(
        code = code"""
          ${c.code}
          InternalRow ${ev.value} = graft.functions.TimeKernels.isoPartsRow(
            ${c.isNull} ? null : ${c.value}, $expectedTz, $handleRef, $allowEmpty);
          boolean ${ev.isNull} = false;""")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** F1 as a native expression (null in, null out — the UDF form NPE'd on
    * null, which no caller relies on; null-propagation is the saner form).
    */
  case class NormalizeIso(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      TimeKernels.normalizeIso(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TimeKernels.normalizeIso($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def isoToParts(c: Column, tz: Int, handle: String, allowEmpty: Boolean): Column =
    ColumnBridge.column(IsoToParts(ColumnBridge.expression(c), tz, handle, allowEmpty))

  def normalizeIso(c: Column): Column =
    ColumnBridge.column(NormalizeIso(ColumnBridge.expression(c)))
}
