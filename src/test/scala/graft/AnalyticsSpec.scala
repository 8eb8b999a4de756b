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

  test("countObserved reports the row count of the consuming action without a rescan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-observe").toString + "/out"
    val df = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    val expected = df.count()
    val observed = Ops.countObserved(df)(_.write.parquet(dir))
    assert(observed == expected)
    assert(spark.read.parquet(dir).count() == expected)
  }
}
