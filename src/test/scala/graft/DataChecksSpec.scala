package graft

import graft.operators.DataChecks
import graft.operators.DataChecks.Expectation
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkTestBase {
  import spark.implicits._

  test("expectationReport counts NULL as a violation and rides one scan") {
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-1.0), "ok"),
      (3L, None, "bad")
    ).toDF("id", "price", "status")
    val rep = DataChecks.expectationReport(df, Seq(
      Expectation("price_positive", $"price" > 0),
      Expectation("status_ok", $"status" === "ok"),
      Expectation("id_present", $"id".isNotNull)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // price > 0 is NULL for the None row: unknown is a violation, not a pass
    assert(rep("price_positive") == ((2L, 3L, 0L)))
    assert(rep("status_ok") == ((1L, 3L, 0L)))
    assert(rep("id_present") == ((0L, 3L, 1L)))
  }

  test("expectationReport plans a single aggregation over one scan") {
    val df = Tables.orders(spark, sfDir)
    val rep = DataChecks.expectationReport(df, Seq(
      Expectation("a", $"o_totalprice" > 0),
      Expectation("b", $"o_custkey" > 0)))
    // every check is an expression in the SAME agg: exactly ONE scan node
    // in the plan however many checks ride it (the long reshape explodes a
    // literal struct array over the one aggregated row — no per-check union
    // duplicating the aggregation subtree)
    val scans = rep.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1, s"checks must share ONE scan, found ${scans.size}")
  }

  test("robustOutliers computes exact median and MAD, odd and even groups") {
    // odd group: values 1..5 -> med 3, deviations (2,1,0,1,2) -> MAD 1
    // even group: values (1,2,3,10) -> med 2.5, devs (1.5,.5,.5,7.5) -> MAD 1
    val df = (Seq.tabulate(5)(i => ("odd", (i + 1).toDouble)) ++
      Seq(("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 10.0)))
      .toDF("g", "v")
    val out = DataChecks.robustOutliers(df, "g", "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("odd") == ((5L, 3.0, 1.0, 0L)))
    // even: the 10.0 deviates 7.5 > 3*1.0 -> one outlier; the two-middle
    // average is the regression canary for integer-vs-double rank math
    assert(out("even") == ((4L, 2.5, 1.0, 1L)))
  }

  test("robust profile survives the heavy tail that blinds mean/stddev") {
    // 99 inliers at ~100 plus one at 1e9: stddev inflates to ~1e8 so the
    // classic 3-sigma gate sees nothing; median/MAD still flag the spike
    val df = (Seq.tabulate(99)(i => ("t", 100.0 + (i % 7))) :+ (("t", 1e9)))
      .toDF("g", "v")
    val r = DataChecks.robustOutliers(df, "g", "v", k = 3.0).head()
    assert(r.getLong(4) >= 1L, "MAD gate flags the spike")
    val stats = df.agg(avg($"v").as("m"), stddev_pop($"v").as("s")).head()
    val sigmaOutliers = df.filter(abs($"v" - stats.getDouble(0)) > 3.0 * stats.getDouble(1)).count()
    assert(sigmaOutliers <= 1L, "the spike drags mean/stddev toward itself")
    assert(r.getDouble(2) < 200.0, "median stays with the inliers")
  }

  test("distributionDrift: exact counts/shares, TVD hand-checked, one-sided buckets survive") {
    // A: 6 en, 2 de; B: 2 en, 1 de, 1 fr (fr only on the B side)
    val a = (Seq.fill(6)("en") ++ Seq.fill(2)("de")).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val b = Seq((100L, "en"), (101L, "en"), (102L, "de"), (103L, "fr"))
      .toDF("id", "lang")
    val out = DataChecks.distributionDrift(a, b, col("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // shares: en 0.75 vs 0.5, de 0.25 vs 0.25, fr 0.0 vs 0.25
    assert(out("en") == ((6L, 2L, 0.75, 0.5, 0.25)))
    assert(out("de") == ((2L, 1L, 0.25, 0.25, 0.25)))
    assert(out("fr") == ((0L, 1L, 0.0, 0.25, 0.25)))
    // TVD = 0.5 * (0.25 + 0 + 0.25) = 0.25 — exactly representable, so the
    // fixed-point round trip is lossless here
    assert(out.values.map(_._5).toSet == Set(0.25))

    // partitioning independence: the fixed-point accumulation is order-free
    val p1 = DataChecks.distributionDrift(a.repartition(1), b.repartition(1), col("lang"))
      .collect().map(_.toSeq).toSet
    val p13 = DataChecks.distributionDrift(a.repartition(13), b.repartition(13), col("lang"))
      .collect().map(_.toSeq).toSet
    assert(p1 == p13)

    // an EMPTY side is "no snapshot", not a NaN factory: its shares are 0
    // and the drift against nothing is exactly 0.5 (total mass moved)
    val empty = Seq.empty[(Long, String)].toDF("id", "lang")
    val vsEmpty = DataChecks.distributionDrift(a, empty, col("lang"))
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(vsEmpty.forall(t => t._3 == 0.0 && !t._2.isNaN))
    assert(vsEmpty.map(_._4).toSet == Set(0.5))
  }
}
