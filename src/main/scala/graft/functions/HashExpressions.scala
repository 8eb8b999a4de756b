package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hash kernels as static-forwarder methods so generated Java can call them
  * directly (`graft.functions.HashKernels.minhash(...)`). Deliberate 64-bit
  * wraparound arithmetic — SQL-level `*`/`+` under ANSI mode (Spark 4
  * default) would raise ARITHMETIC_OVERFLOW, and hash mixing *wants*
  * wraparound.
  */
object HashKernels {
  /** MinHash signature: for each (a_i, b_i) family, min over element hashes
    * of floorMod(a_i * h + b_i, 2^61-1).
    */
  def minhash(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val p = (1L << 61) - 1
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) {
      var best = Long.MaxValue
      var j = 0
      val n = hashes.numElements()
      while (j < n) {
        val v = java.lang.Math.floorMod(a(i) * hashes.getLong(j) + b(i), p)
        if (v < best) best = v
        j += 1
      }
      out(i) = if (n == 0) 0L else best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Order-sensitive FNV-style rolling hash over element hashes. */
  def rolling(hashes: ArrayData): Long = {
    var h = 1469598103934665603L
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      h = h * 1099511628211L + hashes.getLong(i)
      i += 1
    }
    h
  }
}

/** Catalyst expressions wrapping [[HashKernels]]; input is `array<long>`
  * (element hashes from the codegen'd `xxhash64`), output stays primitive.
  */
object HashExpressions {

  case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashKernels.minhash(v.asInstanceOf[ArrayData], a, b)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.minhash($c, $aRef, $bRef);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class RollingHash(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      HashKernels.rolling(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.rolling($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhashSig(elementHashes: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(elementHashes), a, b))

  def rollingHash(elementHashes: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(elementHashes)))
}
