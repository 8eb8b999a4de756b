package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Dimension-mismatch semantics: all kernels score over
  * `min(a.length, b.length)` components (never throw mid-job). A corpus with
  * inconsistent dimensions therefore yields scores over the common prefix —
  * callers that need strictness should assert a uniform `size(vec)` up front
  * (one cheap scan) rather than pay a per-comparison branch in the kernel.
  *
  * The embedding column is `array<float>`; at 100 TB a brute-force similarity
  * scan evaluates the metric billions of times, so these stay inside
  * whole-stage codegen (`doGenCode` emits a tight primitive loop over the
  * unsafe array data — no boxing, no UDF serialization). Compare: the
  * `functions.zip_with`/`aggregate` higher-order-function formulation
  * allocates per-row lambda frames and falls out of codegen.
  */
object VectorExpressions {

  abstract class VectorBinary extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType

    /** Scalar kernel over two float arrays. */
    protected def kernel(a: ArrayData, b: ArrayData): Double

    /** Java source for the loop body; `a`/`b` are ArrayData, result in `ev`.
      * Locals come from `ctx.freshName` — the snippet may be inlined twice
      * into one generated method.
      */
    protected def genKernel(ctx: CodegenContext, ev: String, a: String, b: String): String

    override def nullSafeEval(left: Any, right: Any): Any =
      kernel(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => genKernel(ctx, ev.value.toString, a, b))
  }

  /** dot(a, b) over array<float>. */
  case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
    override protected def kernel(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      s
    }
    override protected def genKernel(ctx: CodegenContext, ev: String, a: String, b: String): String = {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |$ev = $s;
       """.stripMargin
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** cosine(a, b) over array<float>; 0.0 when either norm is zero. */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinary {
    override protected def kernel(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    override protected def genKernel(ctx: CodegenContext, ev: String, a: String, b: String): String = {
      val n = ctx.freshName("n"); val dt = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dt = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dt += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |$ev = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dt / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** L2 norm of array<float>. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < a.numElements()) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val s = ctx.freshName("s"); val i = ctx.freshName("i"); val x = ctx.freshName("x")
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $x = (double) $a.getFloat($i); $s += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** 64-bit SimHash over an array of 64-bit token hashes: each input hash
    * votes +1/-1 per bit position; the sign of each tally forms the output
    * fingerprint. Near-duplicate texts land within a small Hamming distance.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < a.numElements()) {
        val h = a.getLong(i)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val b = ctx.freshName("b"); val out = ctx.freshName("out")
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
           |  }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $out |= (1L << $b); }
           |${ev.value} = $out;
         """.stripMargin)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Nearest-centroid assignment against a small broadcast codebook: returns
    * the index of the centroid with max cosine similarity. The codebook rides
    * into generated code as a reference object — the corpus side is a pure
    * projection, NO join and NO shuffle (the scale-critical property of IVF
    * assignment over 100 TB: each vector is read once, written once).
    */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(v: Any): Any =
      VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorKernels.nearestCentroid($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Symmetric int8 quantization of array<float>: q_i = clamp(floor(x_i *
    * 127 / max|x|), -127, 127) — the standard 4x storage cut for embedding
    * corpora (at 100 TB the embedding column dominates the table; int8
    * probes also read 4x fewer bytes). All arithmetic is IEEE double ops on
    * exactly-widened floats, so any engine reproduces the codes bit-for-bit.
    * A zero vector quantizes to all zeros.
    */
  case class QuantizeVec(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VectorKernels.quantizeVec(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorKernels.quantizeVec($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The dequantization scale paired with [[QuantizeVec]]: max|x| / 127. */
  case class QuantScale(child: Expression) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      VectorKernels.quantScale(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorKernels.quantScale($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Integer dot product over two int8 code arrays — a LONG of exact integer
    * sums (order-free by construction, unlike float accumulation), rescaled
    * to an approximate float dot by `idot * scaleA * scaleB` at the caller.
    */
  case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L; var i = 0
      while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
           |}
           |${ev.value} = $s;
         """.stripMargin)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** Deterministic Johnson–Lindenstrauss sign projection: array<float> (dim
    * D) → array<double> (dim k), p_i = Σ_j s(i,j)·x_j with signs s(i,j) ∈
    * {+1, −1} derived from an LCG over the flat index i·D+j (top bit of
    * `(1103515245·(iD+j) + 12345) mod 2³¹` — the LCG's low bits alternate,
    * its top bit doesn't). No stored matrix, no broadcast, no randomness at
    * runtime: any engine regenerates the same projection from the formula
    * alone, which is what makes an exact cross-engine oracle possible.
    *
    * Scale shape: this is the embedding-corpus shrink step — at 100 TB the
    * vector column dominates; an 8× narrower search space makes every
    * downstream distance 8× cheaper, and the projection itself is a pure
    * scan-stage map (one read, one write, no shuffle). Accumulation is
    * sequential over j, so the doubles are bit-reproducible everywhere.
    */
  case class JlProject(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0, s"projection dim must be positive, got $k")
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VectorKernels.jlProject(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorKernels.jlProject($c, $k);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Squared L2 distance between two array<double> vectors (the projected
    * space of [[JlProject]]): Σ (a_i − b_i)², sequential — exact mirror of a
    * DuckDB list_sum over the same terms.
    */
  case class L2DistSq(left: Expression, right: Expression) extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0; var i = 0
      while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $a.getDouble($i) - $b.getDouble($i); $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  // Column-facing wrappers -------------------------------------------------

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))

  def quantizeVec(vec: Column): Column =
    ColumnBridge.column(QuantizeVec(ColumnBridge.expression(vec)))

  def quantScale(vec: Column): Column =
    ColumnBridge.column(QuantScale(ColumnBridge.expression(vec)))

  def quantizedDot(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jlProject(vec: Column, k: Int): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expression(vec), k))

  def l2DistSq(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistSq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Static-forwarder kernels callable from generated Java. */
object VectorKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def maxAbs(v: ArrayData): Double = {
    var m = 0.0; var i = 0
    while (i < v.numElements()) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > m) m = x
      i += 1
    }
    m
  }

  def quantScale(v: ArrayData): Double = maxAbs(v) / 127.0

  def quantizeVec(v: ArrayData): ArrayData = {
    val m = maxAbs(v)
    val out = new Array[Any](v.numElements())
    var i = 0
    while (i < v.numElements()) {
      val q =
        if (m == 0.0) 0L
        else math.floor(v.getFloat(i).toDouble * 127.0 / m).toLong
      // floor can land on -128 exactly at x = -max|x| (rounding in the
      // divide); clamp keeps the code symmetric in [-127, 127]
      out(i) = math.max(-127L, math.min(127L, q)).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  def jlProject(v: ArrayData, k: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        // LCG over the flat matrix index; mask = mod 2^31 (value stays
        // non-negative), top bit (>= 2^30) picks the sign — the low bits of
        // this LCG alternate with the seed and would be a striped matrix
        val r = (1103515245L * (i.toLong * dim + j) + 12345L) & 0x7FFFFFFFL
        val x = v.getFloat(j).toDouble
        s += (if (r >= 1073741824L) x else -x)
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  def nearestCentroid(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = cen(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }
}
