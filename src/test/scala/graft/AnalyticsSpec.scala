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

  test("countObserved reports the row count of the consuming action without a rescan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-observe").toString + "/out"
    val df = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    val expected = df.count()
    val observed = Ops.countObserved(df)(_.write.parquet(dir))
    assert(observed == expected)
    assert(spark.read.parquet(dir).count() == expected)
  }
}
