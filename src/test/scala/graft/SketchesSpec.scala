package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketches: exactness below saturation, the
  * estimator algebra, bitwise agreement between the driver-side and
  * in-plan forms, the bounded-buffer scale contract, and the shipped
  * query's envelope on the fixture.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch of an unsaturated column IS its distinct hash set (estimate exact)") {
    val df = Seq.tabulate(200)(i => ("g", s"u${i % 37}")).toDF("g", "k")
    val sk = Sketches.sketch(df, "g", "k", 64).head().getSeq[Long](1)
    assert(sk.size == 37, "37 distinct keys < k=64 → sketch holds all hashes")
    assert(sk == sk.distinct.sorted, "sketch is a sorted set")
    assert(Sketches.estimate(sk, 64) == 37.0)
  }

  test("merge is the k smallest of the deduped union; overlap exact when unsaturated") {
    val a = Seq(1L, 3L, 5L, 9L)
    val b = Seq(3L, 4L, 9L, 11L)
    assert(Sketches.merge(a, b, 4) == Seq(1L, 3L, 4L, 5L))
    // both unsaturated at k=16 → union and intersection are EXACT counts
    val (u, i) = Sketches.overlap(a, b, 16)
    assert(u == 6.0 && i == 2.0)
  }

  test("saturated estimate tracks cardinality within the stated envelope") {
    val k = 128
    val df = Seq.tabulate(20000)(i => ("g", s"user_$i")).toDF("g", "k")
    val sk = Sketches.sketch(df, "g", "k", k).head().getSeq[Long](1)
    assert(sk.size == k, "20k distinct ≫ k → saturated")
    val est = Sketches.estimate(sk, k)
    // rse = 1/sqrt(k-2) ≈ 8.9%; 30% ≈ 3.4σ — the same bound the oracle states
    assert(math.abs(est - 20000.0) <= 0.30 * 20000.0, s"est=$est")
  }

  test("MinKAgg buffer never exceeds 4k entries (map-side partials stay bounded)") {
    val agg = new Sketches.MinKAgg(8)
    var buf = agg.zero
    (1 to 1000).foreach { i => buf = agg.reduce(buf, i.toLong * 2654435761L) }
    assert(buf.size <= 32, s"buffer grew to ${buf.size} > 4k")
    assert(agg.finish(buf).size == 8)
  }

  test("in-plan Column estimators agree bitwise with the driver-side Seq forms") {
    val k = 32
    val df = Seq.tabulate(5000)(i => (if (i % 3 == 0) "a" else "b", s"id_${i % 977}"))
      .toDF("g", "k")
    val sk = Sketches.sketch(df, "g", "k", k)
    val pair = sk.agg(
      first(when(col("g") === "a", col("kmv")), ignoreNulls = true).as("a"),
      first(when(col("g") === "b", col("kmv")), ignoreNulls = true).as("b"))
    val row = pair.select(
      Sketches.estimateCol(col("a"), k).as("ea"),
      Sketches.estimateCol(col("b"), k).as("eb"),
      Sketches.unionEstCol(col("a"), col("b"), k).as("eu"),
      Sketches.intersectEstCol(col("a"), col("b"), k).as("ei"),
      col("a"), col("b")).head()
    val a = row.getSeq[Long](4); val b = row.getSeq[Long](5)
    val (u, i) = Sketches.overlap(a, b, k)
    assert(row.getDouble(0) == Sketches.estimate(a, k))
    assert(row.getDouble(1) == Sketches.estimate(b, k))
    assert(row.getDouble(2) == u)
    assert(row.getDouble(3) == i)
  }

  test("MisraGries guarantees hold on a skewed stream for any partitioning") {
    import graft.operators.Sketches
    val cap = 8
    // zipf-ish: token i appears ~1000/i times; heavy head, long tail
    val items = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val n = items.size.toLong
    val bound = n.toDouble / (cap + 1)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 4, 17)) {
      val sk = items.toDS().repartition(parts)
        .select(new Sketches.MisraGriesAgg(cap).toColumn).head()
      assert(sk.size <= cap, s"state ${sk.size} > $cap at parts=$parts")
      sk.foreach { case (k, est) =>
        assert(est <= exact(k), s"overcount of $k at parts=$parts")
      }
      exact.foreach { case (k, c) =>
        val est = sk.getOrElse(k, 0L)
        assert((c - est).toDouble <= bound, s"$k under by ${c - est} > $bound at parts=$parts")
        if (c > bound) assert(sk.contains(k), s"guaranteed HH $k missing at parts=$parts")
      }
    }
  }

  test("MisraGries merge sums then cuts at the (capacity+1)-th largest") {
    import graft.operators.Sketches
    import scala.collection.mutable.{HashMap => MHash}
    val agg = new Sketches.MisraGriesAgg(2)
    val merged = agg.merge(
      new Sketches.MGBuffer(MHash("a" -> 10L, "b" -> 4L), MHash.empty),
      new Sketches.MGBuffer(MHash("b" -> 3L, "c" -> 5L), MHash.empty))
    // summed: a=10 b=7 c=5; cut = 3rd largest = 5 -> a=5, b=2, c drops
    assert(agg.finish(merged) == Map("a" -> 5L, "b" -> 2L))
    // the mutable aggregator path and the shared immutable algebra
    // (HeavyHittersState's cross-batch merge) are the SAME cut
    assert(Sketches.mgCutMerge(
      Map("a" -> 10L, "b" -> 4L), Map("b" -> 3L, "c" -> 5L), 2) ==
      Map("a" -> 5L, "b" -> 2L))
  }

  test("weighted MisraGries: mass guarantees for any partitioning; unit weights = unweighted") {
    import graft.operators.Sketches
    val cap = 8
    // skewed MASS, not frequency: item i arrives 60/i times with weight
    // i*3 — the mass ranking differs from the count ranking
    val items = (1 to 40).flatMap(i => Seq.fill(60 / i)((s"t$i", i * 3L)))
    val wTot = items.map(_._2).sum
    val bound = wTot.toDouble / (cap + 1)
    val exact = items.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    for (parts <- Seq(1, 4, 17)) {
      val sk = items.toDF("k", "w").repartition(parts).as[(String, Long)]
        .select(new Sketches.MisraGriesWeightedAgg(cap).toColumn).head()
      assert(sk.size <= cap, s"state ${sk.size} > $cap at parts=$parts")
      sk.foreach { case (k, est) =>
        assert(est <= exact(k), s"mass overcount of $k at parts=$parts")
      }
      exact.foreach { case (k, m) =>
        val est = sk.getOrElse(k, 0L)
        assert((m - est).toDouble <= bound, s"$k under by ${m - est} > $bound")
        if (m > bound) assert(sk.contains(k), s"guaranteed-heavy $k missing")
      }
    }
    // unit weights: buffer evolution is bit-identical to the unweighted form
    val agg = new Sketches.MisraGriesAgg(3)
    val aggW = new Sketches.MisraGriesWeightedAgg(3)
    val stream = Seq("a", "b", "a", "c", "d", "b", "e", "a", "f", "c")
    val plain = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val unit = aggW.finish(stream.map(_ -> 1L).foldLeft(aggW.zero)(aggW.reduce))
    assert(plain == unit)
    // non-positive weights contribute nothing
    val z = aggW.finish(Seq(("a", 5L), ("b", 0L), ("c", -7L))
      .foldLeft(aggW.zero)(aggW.reduce))
    assert(z == Map("a" -> 5L))
  }

  test("MisraGries guarantees hold at capacity 1024 with the amortized reduce") {
    import graft.operators.Sketches
    // the amortized pending-batch reduce must keep the three guarantees at
    // a vocabulary-sketch capacity, where the old per-arrival
    // decrement-all scan paid O(cap) per non-resident row
    val cap = 1024
    val items = (1 to 4000).flatMap(i => Seq.fill(4000 / i)(s"t$i"))
    val n = items.size.toLong
    val bound = n.toDouble / (cap + 1)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val agg = new Sketches.MisraGriesAgg(cap)
    // driver-side fold + a 3-way partial merge: both paths through the buffer
    val whole = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    val parts = items.grouped(items.size / 3 + 1).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(parts.reduce(agg.merge))
    for (sk <- Seq(whole, merged)) {
      assert(sk.size <= cap)
      sk.foreach { case (k, est) => assert(est <= exact(k), s"overcount of $k") }
      exact.foreach { case (k, c) =>
        assert((c - sk.getOrElse(k, 0L)).toDouble <= bound, s"$k under by too much")
        if (c > bound) assert(sk.contains(k), s"guaranteed HH $k missing")
      }
    }
  }

  test("overlapMatrix emits one row per unordered pair with the estimator algebra") {
    val df = Seq.tabulate(300)(i => (s"g${i % 3}", s"u${i % 50}")).toDF("g", "k")
    val sk = Sketches.sketch(df, "g", "k", 64)
    val m = Sketches.overlapMatrix(sk, "g", 64).collect()
    assert(m.length == 3, "3 groups -> 3 unordered pairs")
    m.foreach { r =>
      assert(r.getString(0) < r.getString(1), "seg_a < seg_b ordering")
      // every user lands in every group (i mod 3 cycles across a user's 6
      // occurrences), and 50 distinct users < k=64 -> estimates are exact
      assert(r.getAs[Double]("est_intersect") == 50.0, r.toString)
      assert(r.getAs[Double]("est_union") == 50.0, r.toString)
    }
  }

  test("kmv_matrix: every envelope flag holds on the fixture") {
    val got = SparkEntry.queries("kmv_matrix")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("union_within_30pct") == 1L, r.toString)
      assert(r.getAs[Long]("intersect_within_40pct") == 1L, r.toString)
    }
  }

  test("kmv_overlap: every envelope flag holds and exacts match a recount") {
    val got = SparkEntry.queries("kmv_overlap")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 7)
    got.filter(_._1.endsWith("_within_30pct")).foreach { case (chk, n) =>
      assert(n == 1L, s"$chk failed the envelope")
    }
    val seg = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "view") && col("value") > 120)
      .select(col("event_type").as("seg"), col("user_id")).distinct()
    assert(got("exact_purchase") == seg.filter($"seg" === "purchase").count())
    assert(got("exact_view") == seg.filter($"seg" === "view").count())
    assert(got("exact_overlap") ==
      seg.groupBy("user_id").agg(countDistinct("seg").as("n")).filter($"n" === 2).count())
  }
}
