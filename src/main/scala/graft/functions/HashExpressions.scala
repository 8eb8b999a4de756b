package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  private def mix(h0: Long, v: Long): Long = {
    var z = h0 ^ v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hashes of all n-gram shingles of a token array, in one pass: each token
    * is xxhash64'd once, then shingle hashes are splitmix folds of the token
    * hashes (position-sensitive, no string concatenation). Fewer than n
    * tokens -> one shingle covering all tokens; empty -> empty.
    *
    * This exists because the Column formulation
    * `transform(sequence(...), i -> concat_ws(slice(tokens, i, n)))`
    * re-evaluates the full `tokens` child (a regex split) once per shingle
    * inside the interpreted lambda — O(tokens²) work per row.
    */
  def ngramHashes(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt == 0) return new GenericArrayData(Array.emptyLongArray)
    val tokHash = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val s = tokens.getUTF8String(i)
      tokHash(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val m = math.max(1, cnt - n + 1)
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = 0x9e3779b97f4a7c15L
      var k = j
      val end = math.min(j + n, cnt)
      while (k < end) { h = mix(h, tokHash(k)); k += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined token windows of `size` tokens starting every `stride`
    * tokens, single pass. stride == 1 gives classic n-gram shingles; stride
    * < size gives overlapping training chunks. Fewer than `size` tokens ->
    * one window of all tokens (empty input -> [""]). Exists for the same
    * reason as [[ngramHashes]]: the `transform(sequence, i ->
    * concat_ws(slice(...)))` formulation runs an interpreted lambda that
    * copies the token array per window.
    */
  def ngramStrings(tokens: ArrayData, size: Int, stride: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val space = UTF8String.fromString(" ")
    val cnt = tokens.numElements()
    // windows start at i*stride for i in [0, lastIdx]; the last window is
    // the first one whose end reaches cnt
    val lastIdx =
      if (cnt <= size) 0
      else ((cnt - size) + stride - 1) / stride
    val out = new Array[Any](lastIdx + 1)
    var j = 0
    while (j <= lastIdx) {
      val start = j * stride
      val end = math.min(start + size, cnt)
      val parts = new Array[UTF8String](math.max(0, end - start))
      var k = start
      while (k < end) { parts(k - start) = tokens.getUTF8String(k); k += 1 }
      out(j) = UTF8String.concatWs(space, parts.toSeq: _*)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Count of elements contained in a fixed string set (stopword / marker
    * scoring) — the `size(filter(arr, t -> t INSET ...))` formulation is an
    * interpreted lambda (CodegenFallback) that broke the codegen span of
    * every quality/lang-id projection.
    */
  def countInSet(arr: ArrayData, set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** LSH band keys over a fixed-length signature: the signature is split into
    * `bands` equal slices and each slice is folded with a splitmix64-style
    * mix into one 64-bit bucket key. Pure long arithmetic — no string
    * round-trip, no per-band array allocation.
    */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    if (bands <= 0 || n % bands != 0)
      // fail loudly: silently truncating the trailing n % bands signature
      // rows would make near-identical signatures collide in every band
      // (and rowsPerBand == 0 would collapse ALL rows into one bucket)
      throw new IllegalArgumentException(
        s"bandKeys: signature length $n is not divisible into $bands bands")
    val rowsPerBand = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L + b
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) {
        var z = h ^ sig.getLong(j)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        h = z ^ (z >>> 31)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Morton interleave of the low `bits` bits of a (even positions) and b
    * (odd positions). Inputs are bucket indices — small and non-negative.
    */
  def zInterleave(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Count of bounds <= x via binary search (bounds ascending). */
  def bucketIndex(x: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
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

  case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashKernels.ngramHashes(v.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.ngramHashes($c, $n);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class NGramStrings(child: Expression, n: Int, stride: Int = 1) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashKernels.ngramStrings(v.asInstanceOf[ArrayData], n, stride)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.ngramStrings($c, $n, $stride);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class CountInSet(child: Expression, values: Seq[String]) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      values.foreach(v => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(v)))
      s
    }
    override def nullSafeEval(v: Any): Any =
      HashKernels.countInSet(v.asInstanceOf[ArrayData], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("countSet", set, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.countInSet($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Z-order (Morton) key: interleaves the low `bits` bits of two
    * non-negative bucket indices, a's bits at even positions. Rows close in
    * BOTH dimensions get close keys, so sorting by the key co-locates them —
    * the multi-dimensional generalization of range clustering.
    */
  case class ZOrderKey(left: Expression, right: Expression, bits: Int) extends BinaryExpression {
    require(bits >= 1 && bits <= 31, "ZOrderKey interleaves 1..31 bits per dimension")
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      HashKernels.zInterleave(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HashKernels.zInterleave($a, $b, $bits);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** Quantile-bucket index: the count of `bounds` entries <= x (bounds
    * sorted ascending), i.e. x below the first bound -> 0, x past the last
    * -> bounds.length. The bounds array (a small driver-side quantile sketch
    * result) rides into generated code as a reference object — the lookup is
    * a binary search per row, no join.
    */
  case class BucketIndex(child: Expression, bounds: Array[Double]) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(v: Any): Any =
      HashKernels.bucketIndex(v.asInstanceOf[Double], bounds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bucketBounds", bounds, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.bucketIndex($c, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class BandKeys(child: Expression, bands: Int) extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      HashKernels.bandKeys(v.asInstanceOf[ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashKernels.bandKeys($c, $bands);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhashSig(elementHashes: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(elementHashes), a, b))

  def rollingHash(elementHashes: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(elementHashes)))

  def bandKeys(signature: Column, bands: Int): Column =
    ColumnBridge.column(BandKeys(ColumnBridge.expression(signature), bands))

  def ngramHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramHashes(ColumnBridge.expression(tokens), n))

  def ngramStrings(tokens: Column, n: Int, stride: Int = 1): Column =
    ColumnBridge.column(NGramStrings(ColumnBridge.expression(tokens), n, stride))

  def countInSet(arr: Column, values: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(arr), values))

  def zOrderKey(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(ZOrderKey(ColumnBridge.expression(a), ColumnBridge.expression(b), bits))

  def bucketIndex(x: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(BucketIndex(ColumnBridge.expression(x), bounds))
}
