package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches: the mergeable sketch family
  * that — unlike HLL — supports SET INTERSECTION estimates, the "audience
  * overlap" question (how many users are in segment A AND segment B)
  * that exact `count(distinct)` answers only with a full co-shuffle of
  * both segments.
  *
  * Hash space: `xxhash64 >>> 11` — a uniform 53-bit non-negative long, so
  * ordering is plain signed-long order and `h * 2^-53` is an exact double
  * in [0, 1). A sketch is the k smallest distinct hash values, ascending.
  *
  * Scale shape: the aggregator's buffer is bounded (≤ 4k longs), so the
  * map-side partial reduces every partition to ≤ k values BEFORE the
  * shuffle; merging two sketches is `k smallest of the union` — partials
  * combine associatively anywhere in the tree, and the final k-long
  * sketches are driver-sized by construction (that is the point of a
  * sketch: the 100 TB scan produces KB of mergeable state).
  *
  * Estimators (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07):
  *   - distinct:  n < k  → exact n;  else  (k-1) / u_k
  *   - union:     estimate of `k smallest of A ∪ B`
  *   - intersect: (|{h ∈ merged : h ∈ A ∧ h ∈ B}| / |merged|) · union_est
  */
object Sketches {

  /** The 53-bit KMV hash of a column (uniform non-negative long). */
  def kmvHash(c: Column): Column = shiftrightunsigned(xxhash64(c), 11)

  /** Bounded k-minimum-values aggregator over already-hashed longs.
    * Deduping inside `best` keeps the sketch a SET under hash collisions
    * and duplicate inputs, which multiset KMV estimation requires.
    */
  class MinKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def best(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
      val appended = buf :+ h
      if (appended.length > 4 * k) best(appended) else appended
    }
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = best(b1 ++ b2)
    override def finish(buf: Seq[Long]): Seq[Long] = best(buf)
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group KMV sketch of `keyCol`: `(group, kmv array<long> asc)`.
    * One shuffle (the groupBy), k-bounded partials on the map side.
    */
  def sketch(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val minK = udaf(new MinKAgg(k), Encoders.scalaLong)
    df.groupBy(col(groupCol))
      .agg(minK(kmvHash(col(keyCol))).as("kmv"))
  }

  private val TwoPow53 = (1L << 53).toDouble

  /** Distinct estimate from a sketch (exact below saturation). */
  def estimate(hs: Seq[Long], k: Int): Double =
    if (hs.size < k) hs.size.toDouble
    else (k - 1).toDouble / (hs.last.toDouble / TwoPow53)

  // ----- in-plan forms over sketch array columns (built-ins only, so the
  // ----- whole estimate pipeline stays one lazy codegen'd plan; these must
  // ----- stay bitwise-equal to the driver-side Seq forms above/below,
  // ----- which SketchesSpec pins)

  /** In-plan [[estimate]]: a sketch column (array<long> asc) → double. */
  def estimateCol(s: Column, k: Int): Column =
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) / (get(s, lit(k - 1)).cast("double") / lit(TwoPow53)))

  /** In-plan [[merge]]: k smallest of the deduped union of two sketches. */
  def mergeCol(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** In-plan union-cardinality estimate of two sketches of the same k. */
  def unionEstCol(a: Column, b: Column, k: Int): Column =
    estimateCol(mergeCol(a, b, k), k)

  /** In-plan intersection-cardinality estimate (Beyer et al. ratio form):
    * the fraction of the merged sketch present in BOTH inputs, scaled by
    * the union estimate. Exact when neither sketch is saturated.
    */
  def intersectEstCol(a: Column, b: Column, k: Int): Column = {
    val m = mergeCol(a, b, k)
    val matches = size(array_intersect(m, array_intersect(a, b)))
    when(size(m) === 0, lit(0.0))
      .otherwise(matches.cast("double") / size(m).cast("double") * estimateCol(m, k))
  }

  /** Merge two sketches: k smallest of the deduped union. */
  def merge(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** Sum two Misra-Gries summaries; if over capacity, subtract the
    * (capacity+1)-th largest counter from all and drop the non-positive
    * (Agarwal et al. merge — the cut destroys >= (capacity+1)·cut mass,
    * which is what bounds the total undercount by N/(capacity+1)).
    * Shared by [[MisraGriesAgg]] and the continuous
    * [[graft.streaming.HeavyHittersState]] maintainer, whose cross-batch
    * merges must be THIS algebra for the guarantees to survive batching.
    */
  def mgCutMerge(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // fold the smaller side into the larger (persistent-map sharing);
    // primitive sort for the cut selection — this runs once per
    // >= capacity arrivals, but its constant still shows at scan speed
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val s = small.foldLeft(big) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    if (s.size <= capacity) s
    else {
      val arr = new Array[Long](s.size)
      var i = 0
      s.valuesIterator.foreach { v => arr(i) = v; i += 1 }
      java.util.Arrays.sort(arr)
      val cut = arr(arr.length - capacity - 1) // (capacity+1)-th largest
      s.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None }
    }
  }

  /** Mutable aggregation buffer for [[MisraGriesAgg]]: `main` is the
    * summary, `pending` an exact count map of recent non-resident
    * arrivals, bounded at `capacity` distinct keys. Reduce is AMORTIZED
    * O(1) at any capacity: a non-resident arrival lands in `pending`
    * instead of paying the classic per-arrival decrement-all scan; when
    * `pending` fills, ONE cut-merge pass folds it into `main` —
    * O(capacity) every >= capacity arrivals. Every mutation is therefore
    * a mergeable-summaries merge (PODS'12): increments are real arrivals,
    * decrements happen only inside the cut, so the aggregator's
    * guarantees hold for any arrival order and any flush schedule.
    *
    * Mutable because Spark keeps a typed Aggregator's buffer as a live
    * OBJECT between `reduce` calls within a partition (serialization
    * happens only at the shuffle boundary): the per-arrival path mutates
    * two open hash maps in place instead of rebuilding persistent-map
    * paths — that allocation churn was a 2× constant on every scan-speed
    * arrival, dominating at small capacities where the cut itself is
    * cheap.
    */
  final class MGBuffer(
      val main: scala.collection.mutable.HashMap[String, Long],
      val pending: scala.collection.mutable.HashMap[String, Long])
    extends Serializable

  /** Misra-Gries heavy-hitters summary: the sketch that FINDS the frequent
    * items with bounded state, where count-min only answers probes for
    * keys you already know. State is at most `capacity` (key, counter)
    * pairs per partial; merging sums counters then subtracts the
    * (capacity+1)-th largest from all (Agarwal et al., "Mergeable
    * Summaries", PODS'12), so the distributed aggregation carries KB-sized
    * partials off every partition of a 100 TB token stream.
    *
    * Guarantees (for ANY merge order — the summary CONTENT may depend on
    * how partials combined, the guarantees never do):
    *   - estimate(k) <= true(k): counters only ever under-count;
    *   - true(k) - estimate(k) <= N / (capacity + 1), N the stream length;
    *   - hence every item with true(k) > N / (capacity + 1) SURVIVES.
    * Queries must state these (deterministic) properties, not the summary
    * content.
    */
  /** In-place form of [[mgCutMerge]]: add `from` into `acc`, and if over
    * capacity subtract the (capacity+1)-th largest counter from all and
    * drop the non-positive — the same Agarwal et al. merge, so every
    * guarantee argument carries over unchanged. Shared by the unweighted
    * and weighted aggregators.
    */
  private def mgCutMergeInto(acc: scala.collection.mutable.HashMap[String, Long],
      from: scala.collection.Map[String, Long], capacity: Int): Unit = {
    from.foreach { case (k, v) =>
      val c = acc.getOrElse(k, 0L)
      acc.update(k, c + v)
    }
    if (acc.size > capacity) {
      val arr = new Array[Long](acc.size)
      var i = 0
      acc.valuesIterator.foreach { v => arr(i) = v; i += 1 }
      java.util.Arrays.sort(arr)
      val cut = arr(arr.length - capacity - 1) // (capacity+1)-th largest
      acc.filterInPlace((_, v) => v > cut)
      acc.mapValuesInPlace((_, v) => v - cut)
    }
  }

  class MisraGriesAgg(capacity: Int)
      extends Aggregator[String, MGBuffer, Map[String, Long]] {
    require(capacity >= 1, "capacity must be positive")

    private def cutMergeInto(acc: scala.collection.mutable.HashMap[String, Long],
        from: scala.collection.Map[String, Long]): Unit =
      mgCutMergeInto(acc, from, capacity)

    override def zero: MGBuffer = new MGBuffer(
      scala.collection.mutable.HashMap.empty, scala.collection.mutable.HashMap.empty)
    override def reduce(buf: MGBuffer, key: String): MGBuffer = {
      val c = buf.main.getOrElse(key, 0L)
      if (c > 0L) buf.main.update(key, c + 1L)
      else if (buf.pending.isEmpty && buf.main.size < capacity)
        buf.main.update(key, 1L)
      else {
        buf.pending.update(key, buf.pending.getOrElse(key, 0L) + 1L)
        if (buf.pending.size >= capacity) {
          cutMergeInto(buf.main, buf.pending)
          buf.pending.clear()
        }
      }
      buf
    }
    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      cutMergeInto(a.main, a.pending); a.pending.clear()
      cutMergeInto(b.main, b.pending)
      cutMergeInto(a.main, b.main)
      a
    }
    override def finish(buf: MGBuffer): Map[String, Long] = {
      cutMergeInto(buf.main, buf.pending); buf.pending.clear()
      buf.main.toMap
    }
    // opaque binary buffer: it crosses the wire only at the shuffle,
    // carrying <= 2*capacity counters
    override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** WEIGHTED Misra-Gries: each arrival carries a non-negative long
    * weight, and the summary answers "which items carry the most MASS" —
    * bytes per token, tokens per domain, cost per key — where the
    * unweighted form only answers "which occur most often". The merge is
    * the identical Agarwal cut (it is weight-agnostic: a weight-w arrival
    * is indistinguishable from w unit arrivals), so the guarantees hold
    * verbatim with W = TOTAL WEIGHT in place of the stream length:
    *   - estimate(k) <= true_mass(k);
    *   - true_mass(k) - estimate(k) <= W / (capacity + 1);
    *   - every item with true_mass(k) > W / (capacity + 1) SURVIVES.
    * With all weights 1 the buffer evolution is bit-identical to
    * [[MisraGriesAgg]] (spec-pinned). Arrivals with weight <= 0
    * contribute nothing and are ignored. Amortization is unchanged — the
    * pending batch is bounded in KEYS, so reduce stays O(1) regardless of
    * the weights' magnitudes.
    */
  class MisraGriesWeightedAgg(capacity: Int)
      extends Aggregator[(String, Long), MGBuffer, Map[String, Long]] {
    require(capacity >= 1, "capacity must be positive")

    override def zero: MGBuffer = new MGBuffer(
      scala.collection.mutable.HashMap.empty, scala.collection.mutable.HashMap.empty)
    override def reduce(buf: MGBuffer, arrival: (String, Long)): MGBuffer = {
      val (key, w) = arrival
      if (w <= 0L) return buf
      val c = buf.main.getOrElse(key, 0L)
      if (c > 0L) buf.main.update(key, c + w)
      else if (buf.pending.isEmpty && buf.main.size < capacity)
        buf.main.update(key, w)
      else {
        buf.pending.update(key, buf.pending.getOrElse(key, 0L) + w)
        if (buf.pending.size >= capacity) {
          mgCutMergeInto(buf.main, buf.pending, capacity)
          buf.pending.clear()
        }
      }
      buf
    }
    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      mgCutMergeInto(a.main, a.pending, capacity); a.pending.clear()
      mgCutMergeInto(b.main, b.pending, capacity)
      mgCutMergeInto(a.main, b.main, capacity)
      a
    }
    override def finish(buf: MGBuffer): Map[String, Long] = {
      mgCutMergeInto(buf.main, buf.pending, capacity); buf.pending.clear()
      buf.main.toMap
    }
    override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Pairwise overlap matrix over a per-group sketch table (the output of
    * [[sketch]]): one row per unordered group pair `(seg_a < seg_b)` with
    * per-side, union, and intersection cardinality estimates. The join is
    * a |groups|²-bounded self-cross of the SKETCH table — S rows of k
    * longs, never the underlying data — so an S-segment audience matrix
    * over a 100 TB corpus costs one grouped scan plus an S²·k driver-scale
    * comparison, where the exact answer would pay S² co-shuffles.
    */
  def overlapMatrix(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("seg_a"), col("kmv").as("__ka"))
    val b = sketches.select(col(groupCol).as("seg_b"), col("kmv").as("__kb"))
    a.join(b, col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        estimateCol(col("__ka"), k).as("est_a"),
        estimateCol(col("__kb"), k).as("est_b"),
        unionEstCol(col("__ka"), col("__kb"), k).as("est_union"),
        intersectEstCol(col("__ka"), col("__kb"), k).as("est_intersect"))
  }

  /** (union_est, intersection_est) for two sketches of the same k. */
  def overlap(a: Seq[Long], b: Seq[Long], k: Int): (Double, Double) = {
    val m = merge(a, b, k)
    val unionEst = estimate(m, k)
    if (m.isEmpty) return (0.0, 0.0)
    val aSet = a.toSet
    val bSet = b.toSet
    val matches = m.count(h => aSet(h) && bSet(h))
    (unionEst, matches.toDouble / m.size * unionEst)
  }
}
