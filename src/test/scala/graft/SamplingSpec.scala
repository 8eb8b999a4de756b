package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** The sampling/mixing family: deterministic membership, statistical rate
  * accuracy, the greedy-prefix/quantile gate semantics, and — the part that
  * matters at 100 TB — the plan shapes: mixture/upsample must stay
  * scan-stage (zero shuffles), the window ops must plan PARTITIONED windows
  * only.
  */
class SamplingSpec extends SparkTestBase with org.scalatest.BeforeAndAfterAll {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").cache()

  // the session is shared across suites (getOrCreate): drop the cached scan
  // so plan-shape suites running later see real parquet scans, not an
  // InMemoryRelation substituted by the cache manager
  override def afterAll(): Unit = {
    docs.unpersist(blocking = true)
    super.afterAll()
  }

  test("unitHash is uniform enough and stable across salts") {
    val n = 4096L
    val ids = spark.range(n).toDF("id")
    val buckets = ids
      .select((Sampling.unitHash(col("id")) * 10).cast("int").as("b"))
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == (0 until 10).toSet, "all 10 deciles populated")
    buckets.values.foreach { c =>
      assert(math.abs(c - n / 10.0) < n / 10.0 * 0.25,
        s"decile count $c should be within 25% of ${n / 10}")
    }
    // different salts decorrelate: the same id set agrees on ~p^2 under two
    // independent p-filters, not ~p (which nested/identical draws would give)
    val p = 0.5
    val both = ids.filter(
      Sampling.unitHash(col("id"), 1) < p && Sampling.unitHash(col("id"), 999) < p)
      .count()
    assert(math.abs(both - n * p * p) < n * 0.08,
      s"salted draws must cross, not nest: got $both, expected ~${n * p * p}")
  }

  test("mixtureSample keeps ~weight per domain, deterministically, with zero shuffles") {
    val weights = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5)
    val out = Sampling.mixtureSample(docs, "source", "doc_id", weights)
    val byDomain = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("src0") == totals("src0"), "weight 1.0 keeps everything")
    assert(!byDomain.contains("src1"), "weight 0.0 drops the domain")
    assert(byDomain.keySet.subsetOf(Set("src0", "src2")),
      "defaultWeight 0.0 drops unlisted domains")
    val kept2 = byDomain.getOrElse("src2", 0L).toDouble / totals("src2")
    assert(kept2 > 0.2 && kept2 < 0.8, s"src2 kept rate $kept2 should be ~0.5")
    // deterministic: a re-run selects the identical id set
    val again = Sampling.mixtureSample(docs, "source", "doc_id", weights)
    assert(out.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(out.select("doc_id")).isEmpty)
    // the scale property: one scan-stage filter, no shuffle, no join
    val shuffles = out.queryExecution.sparkPlan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, "mixtureSample must not shuffle")
  }

  test("upsampleEpochs emits floor/ceil copies with distinct epoch indices, zero shuffles") {
    val out = Sampling.upsampleEpochs(docs, "lang", "doc_id",
      Map("en" -> 2.25, "de" -> 0.5), salt = 7).cache()
    try {
      // every (doc_id, epoch) pair is unique and epochs are dense from 0
      assert(out.groupBy("doc_id", "epoch").count().filter($"count" > 1).isEmpty)
      val perDoc = out.groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("copies"), max($"epoch").as("max_e"))
      assert(perDoc.filter($"copies" =!= $"max_e" + 1).isEmpty,
        "epoch indices must be 0..copies-1")
      // en docs get 2 or 3 copies, ~25% getting 3; de docs 0 or 1; others exactly 1
      assert(perDoc.filter($"lang" === "en" && !$"copies".isin(2L, 3L)).isEmpty)
      assert(perDoc.filter($"lang" === "de" && $"copies" =!= 1L).isEmpty,
        "surviving de docs have exactly 1 copy (0-copy docs are absent)")
      assert(perDoc.filter(!$"lang".isin("en", "de") && $"copies" =!= 1L).isEmpty)
      val en = perDoc.filter($"lang" === "en").agg(
        count(lit(1)).as("n"), sum(when($"copies" === 3, 1L).otherwise(0L)).as("three"))
        .head()
      val frac3 = en.getLong(1).toDouble / en.getLong(0)
      assert(frac3 > 0.05 && frac3 < 0.5, s"~25% of en docs get the 3rd copy, got $frac3")
      val shuffles = out.queryExecution.sparkPlan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, "upsampleEpochs must not shuffle")
    } finally out.unpersist()
  }

  test("stratifiedSample caps every stratum at k with a partitioned window") {
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id", k = 5, salt = 3)
    val sizes = out.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5), "no stratum exceeds k")
    assert(out.join(docs, Seq("doc_id"), "left_anti").isEmpty, "output ⊆ input")
    // a small stratum passes through whole
    val tiny = docs.filter($"lang" === "zh").limit(3)
    assert(Sampling.stratifiedSample(tiny, "lang", "doc_id", k = 5).count() == tiny.count())
    val global = out.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "window must be partitioned by the stratum")
  }

  test("cappedPerKey equals the single-window top-n at every subSplits") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)
    val reference = docs
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"doc_id").as[Long].collect().toSet
    for (splits <- Seq(1, 3, 8, 32)) {
      val got = Sampling.cappedPerKey(docs, "source", "doc_id",
        Seq($"n_chars".desc), n = 10, subSplits = splits)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == reference, s"subSplits=$splits must be exact")
    }
  }

  test("cappedPerKey survives a mega-key and plans only partitioned windows") {
    // one key owns 500 rows, the other 3 — the shape that floods a single
    // sort task in the classic window plan
    val rows = (1L to 500L).map(i => ("hot", i, i % 97)) ++
      Seq(("cold", 501L, 1L), ("cold", 502L, 2L), ("cold", 503L, 3L))
    val df = rows.toDF("k", "id", "q")
    val out = Sampling.cappedPerKey(df, "k", "id", Seq($"q".desc), n = 4, subSplits = 5)
    val byKey = out.collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(byKey("cold").map(_._2).toSet == Set(501L, 502L, 503L),
      "an under-cap key passes through whole")
    // exact per-key top-4 under (q desc, id asc): q=96 at ids 96,193,290,387
    assert(byKey("hot").map(_._2).toSet == Set(96L, 193L, 290L, 387L))
    val windows = out.queryExecution.sparkPlan.collect { case wx: WindowExec => wx }
    assert(windows.length == 2, "two exact window passes")
    assert(windows.forall(_.partitionSpec.nonEmpty), "never a global window")
    // the local pass partitions by (key, split) — the mega-key spreads
    assert(windows.exists(_.partitionSpec.length == 2),
      "pass 1 must partition by the salted split as well as the key")
  }

  test("tokenBudgetSelect takes the greedy best-first prefix within budget") {
    val rows = Seq(
      ("a", 1L, 10.0, 400L), ("a", 2L, 9.0, 400L), ("a", 3L, 8.0, 300L),
      ("a", 4L, 7.0, 300L), // would cross 1000 at cum=1400 → excluded
      ("a", 5L, 6.0, 100L), // also excluded: greedy stops counting, cum=1500
      ("b", 6L, 1.0, 999L), ("b", 7L, 2.0, 2000L) // best-first: 7 alone busts
    ).toDF("g", "id", "quality", "toks")
    val out = Sampling.tokenBudgetSelect(rows, "g", "id", $"quality", $"toks", budget = 1000)
      .select($"id").as[Long].collect().toSet
    // group a: 400+400 fits, +300 crosses... 400+400=800, +300=1100 > 1000 →
    // id 3 excluded, and the running sum keeps accumulating so 4,5 excluded too
    // group b: quality order is id 7 (2000 busts) then id 6 — strict greedy
    // excludes both (the prefix property, same as the SQL window replay)
    assert(out == Set(1L, 2L))
  }

  test("quantileQualityFilter drops the bottom quantile, ties together") {
    val rows = Seq(
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 2.0), ("a", 4L, 3.0),
      ("b", 5L, 9.0)
    ).toDF("g", "id", "score")
    // group a, dropBelow=0.5: scores 1.0,1.0 have cume_dist 0.5 → dropped
    // TOGETHER; 2.0 (0.75) and 3.0 (1.0) survive. singleton group b: cume 1.0
    val out = Sampling.quantileQualityFilter(rows, "g", $"score", dropBelow = 0.5)
      .select($"id").as[Long].collect().toSet
    assert(out == Set(3L, 4L, 5L))
  }

  test("importanceResample prefers target-like docs and stays deterministic") {
    // two dialects: target docs repeat "alpha beta", off-target "gamma delta".
    // a raw doc written in the target dialect must outscore one that is not.
    val rows = (0L until 40L).map { i =>
      val tgt = i < 10
      val text = if (tgt || i % 2 == 0) "alpha beta alpha beta alpha beta"
                 else "gamma delta gamma delta gamma delta"
      (i, text, if (tgt) "target" else "raw")
    }.toDF("doc_id", "text", "split")
    val out = Sampling.importanceResample(
      rows, "doc_id", "text", col("split") === "target", k = 40, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val tgtLike = out(12L)  // raw, target dialect
    val offTgt = out(11L)   // raw, off-target dialect
    // the raw mix is majority target-dialect, so the target-like ratio sits
    // near 1 (smoothing pulls it slightly under); the off-dialect doc's
    // buckets never occur in the target slice and crater toward 0
    assert(tgtLike > 0.8 && offTgt < 0.2 && tgtLike > offTgt * 5,
      s"likelihood ratio must separate dialects: $tgtLike vs $offTgt")
    // empty doc scores the neutral 1.0 and still appears
    val withEmpty = rows.unionByName(Seq((99L, "", "raw")).toDF("doc_id", "text", "split"))
    val empt = Sampling.importanceResample(
      withEmpty, "doc_id", "text", col("split") === "target", k = 41, buckets = 64)
      .filter(col("doc_id") === 99L).collect()
    assert(empt.length == 1 && empt(0).getDouble(2) == 1.0)
    // determinism across partitionings (fixed-point sums + hash priorities)
    val a = Sampling.importanceResample(rows.repartition(7), "doc_id", "text",
      col("split") === "target", k = 40, buckets = 64).collect().map(_.toSeq).toSeq
    val b = Sampling.importanceResample(rows.repartition(2), "doc_id", "text",
      col("split") === "target", k = 40, buckets = 64).collect().map(_.toSeq).toSeq
    assert(a == b, "selection must be bitwise identical at any parallelism")
  }

  test("importanceResample's priority order samples high-weight docs first") {
    val rows = (0L until 100L).map { i =>
      (i, if (i < 50) "alpha beta alpha beta" else "gamma delta gamma delta",
        if (i < 10) "t" else "r")
    }.toDF("doc_id", "text", "split")
    val picked = Sampling.importanceResample(
      rows, "doc_id", "text", col("split") === "t", k = 20, buckets = 64)
      .select("doc_id").as[Long].collect().toSet
    // priority = score/u: the 40 target-dialect raw docs carry a far larger
    // weight, so the 20 winners skew heavily toward them
    val targetLike = picked.count(_ < 50)
    assert(targetLike >= 15, s"expected the sample to skew target-like, got $targetLike/20")
  }

  test("shuffleOrder is a deterministic permutation that breaks id locality") {
    val ordered = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", salt = 1)
      .as[Long].collect()
    assert(ordered.sorted.toSeq == docs.select("doc_id").as[Long].collect().sorted.toSeq,
      "a permutation: same multiset")
    val again = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", salt = 1)
      .as[Long].collect()
    assert(ordered.toSeq == again.toSeq, "same salt → same order")
    val other = Sampling.shuffleOrder(docs.select("doc_id"), "doc_id", salt = 2)
      .as[Long].collect()
    assert(ordered.toSeq != other.toSeq, "different salt → different order")
    // locality scatter: consecutive output ids are rarely consecutive inputs
    val adjacent = ordered.sliding(2).count(p => math.abs(p(1) - p(0)) == 1)
    assert(adjacent < ordered.length / 10, s"id runs must scatter, got $adjacent adjacent pairs")
  }

  test("unitHash never overflows and matches the exact algebra at lake-scale ids") {
    // ids above ~3.4e9 used to overflow the Int64 product: Spark wrapped
    // (non-ANSI) while the SQL mirror raised — breaking the bit-for-bit
    // oracle contract exactly at the scale the operator targets. The
    // internal fold to [0, 2^31) bounds the product below 2^63; this pins
    // both the no-exception behavior and the exact value via BigInt replay.
    val ids = Seq(0L, 1L, 2147483647L, 2147483648L, 5000000000L,
      987654321987L, Long.MaxValue - 1)
    val salt = 11L
    def expected(id: Long): Double = {
      val folded = ((BigInt(id) + salt) mod BigInt(2147483648L)).toLong
      ((BigInt(folded) * BigInt(2654435761L)) mod BigInt(4294967296L)).toDouble / 4294967296.0
    }
    val got = ids.toDF("id")
      .select($"id", Sampling.unitHash($"id", salt).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (id <- ids) {
      assert(got(id) == expected(id), s"id $id: ${got(id)} != ${expected(id)}")
      assert(got(id) >= 0.0 && got(id) < 1.0)
    }
    // ids below the fold boundary hash exactly as the unfolded original form
    assert(got(1L) == ((1L + salt) * 2654435761L % 4294967296L).toDouble / 4294967296.0)
  }

  test("groupSplit never lets a group span both sides and composes with dedup CC") {
    // synthetic near-dup clusters: docs 0-2 one cluster, 3-4 another, 5-9
    // singletons; the group key is each doc's cluster representative
    val rep = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L) ++
      (5L to 9L).map(i => i -> i).toMap
    val df = rep.toSeq.toDF("doc_id", "rep")
    val split = Sampling.groupSplit(df, "rep", holdoutFrac = 0.4, salt = 3L)
    val sidesPerGroup = split.groupBy("rep")
      .agg(countDistinct($"split").as("sides"))
      .select(max($"sides")).head().getLong(0)
    assert(sidesPerGroup == 1L, "a group spanned both sides")
    // the decision matches the unit hash row for row (RNG-free, replayable)
    split.collect().foreach { r =>
      val u = ((r.getLong(1) + 3L) * 2654435761L % 4294967296L).toDouble / 4294967296.0
      assert(r.getString(2) == (if (u < 0.4) "holdout" else "train"), r.toString)
    }
    // both sides non-empty at this frac/salt, and the clobber guard holds
    assert(split.select("split").distinct().count() == 2L)
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(df.withColumn("split", lit("x")), "rep", 0.4)
    }
    intercept[IllegalArgumentException] { Sampling.groupSplit(df, "rep", 1.0) }
  }

  test("leakage_safe_split: no md5 cluster spans sides; duplicates ride their rep") {
    val out = SparkEntry.queries("leakage_safe_split")(spark, sfDir)
    val spanning = out.groupBy("rep").agg(countDistinct($"split").as("s"))
      .filter($"s" > 1).count()
    assert(spanning == 0L)
    assert(out.count() == Tables.documents(spark, sfDir).count(),
      "every doc must be assigned")
  }
}
