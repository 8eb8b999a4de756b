package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text pipelines: NFC-normalize, strip accents
  * (combining marks), lowercase — the standard fold applied before exact /
  * near dedup so that `"Éléphant"`, `"Éléphant"` (decomposed) and
  * `"elephant"` land in the same bucket. Spark ships no normalizer function;
  * a Scala UDF would break whole-stage codegen on what is by definition a
  * full-corpus scan, so this is a native Catalyst expression whose generated
  * code calls one static kernel.
  *
  * Semantics match DuckDB's `lower(strip_accents(nfc_normalize(x)))` (the
  * oracle formulation): decompose (NFD), drop all Unicode mark categories
  * (Mn/Mc/Me — what utf8proc's STRIPMARK drops), recompose (NFC), then
  * codepoint lowercase. Verified against DuckDB goldens in
  * StringNormalizeSpec.
  */
object StringKernels {

  /** ASCII bytes fold without touching the (allocating) Normalizer — at
    * 100 TB most web text is ASCII-dominant and this is a scan-stage kernel.
    */
  private def foldAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      out(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def isAscii(s: UTF8String): Boolean = {
    var i = 0
    val n = s.numBytes
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  def fold(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (!isMark(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    Normalizer.normalize(sb, Normalizer.Form.NFC).toLowerCase(java.util.Locale.ROOT)
  }

  def foldUtf8(s: UTF8String): UTF8String =
    if (isAscii(s)) foldAscii(s)
    else UTF8String.fromString(fold(s.toString))
}

object StringNormalize {

  case class UnicodeFold(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      StringKernels.foldUtf8(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.StringKernels.foldUtf8($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column API: `unicodeFold($"text")`. */
  def unicodeFold(c: Column): Column =
    ColumnBridge.column(UnicodeFold(ColumnBridge.expression(c)))
}
