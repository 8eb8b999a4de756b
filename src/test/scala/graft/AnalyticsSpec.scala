package graft

import graft.operators.Ops
import org.apache.spark.sql.functions._

/** Statistics / sketch / metrics surface: the exact-moment formulas match
  * Spark's built-in estimators, approximate sketches land within their error
  * bounds of the exact answers, and observe-metrics count without rescans.
  */
class AnalyticsSpec extends SparkTestBase {

  test("stats_moments matches Spark's built-in var_samp/stddev/corr within 1e-9") {
    val got = SparkEntry.queries("stats_moments")(spark, sfDir)
      .select("l_returnflag", "var_qty", "std_qty", "corr_qty_price")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(var_samp("l_quantity").as("v"), stddev_samp("l_quantity").as("s"),
        corr("l_quantity", "l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (v, s, c)) =>
      assert(math.abs(v - ref(k)._1) < 1e-9 * math.max(1.0, math.abs(v)), s"var $k")
      assert(math.abs(s - ref(k)._2) < 1e-9 * math.max(1.0, math.abs(s)), s"std $k")
      assert(math.abs(c - ref(k)._3) < 1e-9, s"corr $k")
    }
  }

  test("percentile_qty matches a driver-side sort of the raw values") {
    val qs = SparkEntry.queries("percentile_qty")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byFlag = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(xs: IndexedSeq[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = xs(pos.toInt); val hi = xs(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    byFlag.foreach { case (flag, vsSeq) =>
      val vs = vsSeq.toIndexedSeq
      assert(qs(flag)._1 == pct(vs, 0.25), s"p25 $flag")
      assert(qs(flag)._2 == pct(vs, 0.5), s"p50 $flag")
      assert(qs(flag)._3 == pct(vs, 0.75), s"p75 $flag")
    }
  }

  test("approximate sketches land within error bounds of the exact answers") {
    val o = Tables.orders(spark, sfDir)
    val exactD = o.select(countDistinct("o_custkey")).head().getLong(0)
    val approxD = o.select(approx_count_distinct("o_custkey", rsd = 0.05)).head().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.15, s"$approxD vs $exactD")

    val exactMedian = o.select(expr("percentile(o_totalprice, 0.5)")).head().getDouble(0)
    val approxMedian = o.select(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // percentile_approx with accuracy 1000 is rank-accurate to ~0.1%
    val sortedPrices = o.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val rank = sortedPrices.indexWhere(_ >= approxMedian)
    assert(math.abs(rank.toDouble / sortedPrices.length - 0.5) < 0.01, s"$approxMedian vs $exactMedian")
  }

  test("pseudonymize: stable within a salt, unlinkable across salts, NULL passthrough") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val rows = Seq((Some(7L), "a"), (Some(7L), "b"), (Some(9L), "c"),
      (None: Option[Long], "d")).toDF("uid", "v")
    val t1 = TextAnalysis.pseudonymize(rows, Seq("uid"), "s1")
      .select("uid", "v").as[(Option[String], String)].collect()
      .map { case (tok, v) => v -> tok }.toMap
    // same value + same salt -> same token; distinct values -> distinct
    assert(t1("a") == t1("b") && t1("a") != t1("c"))
    assert(t1("a").get.length == 16)
    assert(t1("d").isEmpty, "NULL ids stay NULL")
    // a different salt yields unlinkable tokens
    val t2 = TextAnalysis.pseudonymize(rows, Seq("uid"), "s2")
      .select("uid", "v").as[(Option[String], String)].collect()
      .map { case (tok, v) => v -> tok }.toMap
    assert(t2("a") != t1("a"))
    intercept[IllegalArgumentException] {
      TextAnalysis.pseudonymize(rows, Seq("uid"), "")
    }
  }

  test("piiScrub counts on the original text and redacts every pattern in order") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val rows = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or admin@x.io, host 192.168.0.1"),
      (2L, "ssn 123-45-6789 then call 555-123-4567 twice: 555-123-4567"),
      (3L, "no pii here at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(rows, "text")
      .select("doc_id", "pii_email", "pii_ipv4", "pii_ssn", "pii_phone", "text")
      .collect().map(r => r.getLong(0) ->
        (r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toMap
    assert(out(1L) == ((2L, 1L, 0L, 0L,
      "mail me at [PII] or [PII], host [PII]")))
    // the phone (3-3-4) must NOT be eaten by the SSN rule (3-2-4), and
    // repeated matches all redact
    assert(out(2L) == ((0L, 0L, 1L, 2L,
      "ssn [PII] then call [PII] twice: [PII]")))
    assert(out(3L) == ((0L, 0L, 0L, 0L, "no pii here at all")))
    // null text: counts and text stay null, never a crash
    assert(out(4L) == ((null, null, null, null, null)))
  }

  test("tfidf minDf knob drops rare terms and cuts the ranking candidate set") {
    import graft.operators.TextAnalysis
    // the knob cuts the tf-join-df candidate stage (the per-doc top-k
    // ranking's input): measure it with Spark's observe() metric (via
    // Ops.countObserved) — the post-ranking shuffle is already bounded by
    // WindowGroupLimit, so candidate rows are where the Zipf-tail saving
    // physically lands. The testdata corpus has a closed vocabulary (no
    // hapax terms), so build one WITH a tail: shared words + a per-doc typo.
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, s"the quick brown fox shares these words typo$i"))
      .toDF("doc_id", "text")
    val base = Ops.countObserved(TextAnalysis.tfidfCandidates(docs, minDf = 1))(
      _.write.mode("overwrite").format("noop").save())
    val cut = Ops.countObserved(TextAnalysis.tfidfCandidates(docs, minDf = 2))(
      _.write.mode("overwrite").format("noop").save())
    // exactly the 200 hapax typo tokens drop out of the candidate set
    assert(cut == base - 200, s"minDf=2 should drop the hapax candidates ($cut vs $base)")

    // semantics with the knob on: no surviving term has df < 2 (without it,
    // hapax terms dominate the top-k — df=1 maximizes idf), per-doc <= k
    val out = TextAnalysis.tfidfTopTerms(docs, k = 3, minDf = 2)
    assert(!out.select("token").as[String].collect().exists(_.startsWith("typo")))
    val noKnob = TextAnalysis.tfidfTopTerms(docs, k = 3, minDf = 1)
    assert(noKnob.filter(col("token").startsWith("typo")).count() == 200,
      "without the knob every doc's top term is its hapax typo")
    val perDoc = out.groupBy("doc_id").count().select(max("count")).head().getLong(0)
    assert(perDoc <= 3L && out.count() > 0)
  }

  test("classifierScore: margin is the mean hashed token weight, deterministic, threshold gates") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha alpha alpha"), // repeated token: margin = that token's weight
      (2L, "")                   // empty: margin = bias, no tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs, bias = 0.1, threshold = 0.0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // driver-side replay of the weight formula for doc 1
    def w(tok: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(8), 16)
      (h % 1001L - 500L).toDouble / 500.0
    }
    val exp1 = math.floor(w("alpha") * 1048576.0) * 3 / 3 / 1048576.0 + 0.1
    assert(out(1)._2 == 3L && math.abs(out(1)._3 - exp1) < 1e-12)
    assert(out(2) == (2L, 0L, 0.1, 1L), "empty doc scores the bias")
    out.foreach { case (_, _, margin, pass) =>
      assert((margin > 0.0) == (pass == 1L))
    }
    // determinism: same input, same margins
    val again = TextAnalysis.classifierScore(docs, bias = 0.1, threshold = 0.0)
      .orderBy("doc_id").as[(Long, Long, Double, Long)].collect().toSeq
    assert(again == out)
  }

  test("trainPerceptron learns a separating table and the trained scorer separates") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // linearly separable seed set: positive docs share 'good'-family tokens,
    // negative docs 'bad'-family — plus a shared neutral token both sides use
    val docs = Seq(
      (1L, "good fine great common words here", true),
      (2L, "good great nice common tokens again", true),
      (3L, "fine nice good common stuff here", true),
      (4L, "bad awful poor common words here", false),
      (5L, "awful poor ugly common tokens again", false),
      (6L, "poor ugly bad common stuff here", false)
    ).toDF("doc_id", "text", "label")
    val w = TextAnalysis.trainPerceptron(docs, "doc_id", "text", col("label"), buckets = 256, iters = 3)
    val weights = w.as[(Long, Long)].collect().toMap
    assert(weights.nonEmpty && weights.values.exists(_ > 0) && weights.values.exists(_ < 0),
      s"a separable seed set must learn signed weights: $weights")
    // weights are integers and bitwise identical at a different parallelism
    val w7 = TextAnalysis.trainPerceptron(docs.repartition(7), "doc_id", "text",
      col("label"), buckets = 256, iters = 3).as[(Long, Long)].collect().toMap
    assert(w7 == weights, "training must be partitioning-independent")
    // the trained scorer separates the seed set it converged on
    val scored = TextAnalysis.scoreWithWeights(docs, "doc_id", "text", w, buckets = 256)
      .select($"doc_id", $"predicted").as[(Long, Long)].collect().toMap
    assert((1L to 3L).forall(scored(_) == 1L) && (4L to 6L).forall(scored(_) == -1L),
      s"trained weights must separate the training set: $scored")
  }

  test("bigramLmScore: corpus-typical phrasing outscores atypical recombination") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // docs 0-3 repeat the phrase "a b c d"; doc 4 recombines the SAME tokens
    // in an order the corpus never continues ("a c b d") — its prefixes are
    // ambiguous (a/b/c each continue differently elsewhere), so every bigram
    // probability is low. Hand-computed: common bigrams score 4/5 each
    // (avg 0.8), recombined ones 1/5 each (avg 0.2).
    val docs = ((0L to 3L).map(i => (i, "a b c d")) :+ ((4L, "a c b d"))).toSeq
    val out = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == 3L && out(4L)._2 == 3L)
    assert(math.abs(out(0L)._3 - 0.8) < 1e-5, s"common phrasing ~0.8, got ${out(0L)._3}")
    assert(math.abs(out(4L)._3 - 0.2) < 1e-5, s"recombination ~0.2, got ${out(4L)._3}")
    assert(out(0L)._3 > out(4L)._3)
    // sub-2-token docs emit zero bigrams and score 0
    val tiny = TextAnalysis.bigramLmScore(Seq((9L, "single")).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().head
    assert(tiny == ((9L, 0L, 0.0)))
  }

  test("count-min sketch never underestimates and stays within its envelope") {
    import spark.implicits._
    import graft.functions.SketchFunctions
    // skewed multiset: "hot" x 5000, "warm" x 500, 2000 singletons
    val rows = Seq.fill(5000)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 2000).map(i => s"rare$i")
    val n = rows.size.toLong
    def build(partitions: Int) =
      rows.toDF("k").repartition(partitions).as[String]
        .select(new SketchFunctions.CountMinAgg(4, 1024).toColumn).head()
    val cms = build(7)
    assert(cms.estimate("hot") >= 5000L && cms.estimate("warm") >= 500L)
    assert(cms.estimate("rare7") >= 1L)
    assert(cms.estimate("never-seen-key") <= math.ceil(0.01 * n).toLong,
      "an absent key's estimate is pure collision mass, bounded by eps*N")
    Seq("hot", "warm", "rare7").foreach { k =>
      val exact = rows.count(_ == k).toLong
      assert(cms.estimate(k) <= exact + math.ceil(0.01 * n).toLong,
        s"estimate for $k outside the envelope: ${cms.estimate(k)} vs $exact")
    }
    // merges are element-wise sums: any partitioning yields the same grid
    assert(build(1).counters.toSeq == cms.counters.toSeq)
  }

  test("countObserved reports the row count of the consuming action without a rescan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-observe").toString + "/out"
    val df = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    val expected = df.count()
    val observed = Ops.countObserved(df)(_.write.parquet(dir))
    assert(observed == expected)
    assert(spark.read.parquet(dir).count() == expected)
  }

  test("compressionRatio separates boilerplate from noise and handles empties") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val noisy = (0 until 400).map(_ => rnd.nextPrintableChar()).mkString
    val docs = Seq(
      (1L, "lorem ipsum " * 50),  // templated boilerplate
      (2L, noisy),                // high-entropy text
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._3 < 0.2, s"boilerplate compresses hard: ${out(1L)}")
    assert(out(2L)._3 > out(1L)._3 * 3, "noise compresses far worse than boilerplate")
    assert(out(1L)._1 == 600L && out(1L)._2 > 0L)
    assert(out(3L) == ((0L, 0L, 1.0)) && out(4L) == ((0L, 0L, 1.0)))
    // deterministic across partitionings (one deflater per partition, reset per row)
    val p13 = graft.operators.TextAnalysis.compressionRatio(docs.repartition(13), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(p13 == out.map { case (k, (a, b, c)) => Seq[Any](k, a, b, c) }.toSet)
  }
}
