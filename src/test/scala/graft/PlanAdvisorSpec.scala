package graft

import graft.plans.PlanAdvisor
import graft.plans.PlanAdvisor._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Each PlanAdvisor detector must fire on a minimal offending plan and stay
  * silent on the scale-safe rewrite of the same computation — both
  * directions, so the advisor neither misses the killer nor cries wolf on
  * the plan we actually recommend. Plus the pipeline-level gate: advisor
  * mode `fail` vetoes a Critical plan with GraftPlanError before any job
  * runs, `log` lets it through.
  */
class PlanAdvisorSpec extends SparkTestBase {

  import spark.implicits._

  private def warningsOf(df: org.apache.spark.sql.DataFrame): Seq[PlanWarning] =
    PlanAdvisor.advise(df)

  test("cartesian join fires on a keyless join, silent on the equi-join") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r = Seq((1, 10), (2, 20)).toDF("k", "w")
    val bad = warningsOf(l.crossJoin(r))
    assert(bad.exists(_.isInstanceOf[CartesianJoin]))
    assert(bad.head.severity == Critical, "criticals sort first")
    assert(!warningsOf(l.join(r, "k")).exists(_.isInstanceOf[CartesianJoin]))
  }

  test("UDF fallback fires on a ScalaUDF, silent on the builtin equivalent") {
    // range-backed, not a local Seq: ConvertToLocalRelation would fold a
    // deterministic UDF over literal rows at OPTIMIZATION time, leaving no
    // ScalaUDF in the physical plan to detect
    val df = spark.range(5).selectExpr("CAST(id AS STRING) AS s")
    val f = udf((s: String) => s.length)
    assert(warningsOf(df.select(f($"s"))).exists(_.isInstanceOf[UdfFallback]))
    assert(!warningsOf(df.select(length($"s"))).exists(_.isInstanceOf[UdfFallback]))
  }

  test("global window fires on empty partitionBy, silent on partitioned and on top-k") {
    val df = Seq(("a", 1), ("b", 2), ("a", 3)).toDF("g", "x")
    val global = df.withColumn("rn", row_number().over(Window.orderBy($"x")))
    assert(warningsOf(global).exists(_.isInstanceOf[GlobalWindow]))
    val partitioned = df.withColumn("rn",
      row_number().over(Window.partitionBy($"g").orderBy($"x")))
    assert(!warningsOf(partitioned).exists(_.isInstanceOf[GlobalWindow]))
    // the recommended rewrite for "rank then keep k": orderBy+limit —
    // TakeOrderedAndProject, no Window at all
    assert(warningsOf(df.orderBy($"x").limit(2)).isEmpty)
  }

  test("single-partition funnel fires on repartition(1) and coalesce(1), not on scalar aggs") {
    val df = spark.range(100).toDF("id")
    assert(warningsOf(df.repartition(1)).exists(_.isInstanceOf[SinglePartitionFunnel]))
    assert(warningsOf(df.coalesce(1)).exists(_.isInstanceOf[SinglePartitionFunnel]))
    // a scalar aggregate legitimately converges to one partition AFTER
    // map-side partials — that is not a funnel and must not warn
    assert(!warningsOf(df.agg(sum($"id"))).exists(_.isInstanceOf[SinglePartitionFunnel]))
    assert(!warningsOf(df.repartition(8)).exists(_.isInstanceOf[SinglePartitionFunnel]))
  }

  test("global sort is advisory: fires on a bare total order, not under a limit") {
    val df = spark.range(100).toDF("id")
    val ws = warningsOf(df.orderBy($"id".desc))
    assert(ws.exists(_.isInstanceOf[GlobalSort]))
    assert(ws.filter(_.isInstanceOf[GlobalSort]).forall(_.severity == Advisory),
      "a distributed range sort is legitimate — advisory, never critical")
    assert(!warningsOf(df.orderBy($"id".desc).limit(5)).exists(_.isInstanceOf[GlobalSort]))
  }

  test("unpushed scan filters fire when no predicate reaches parquet") {
    val dir = java.nio.file.Files.createTempDirectory("advisor_scan").toString
    try {
      spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s").write.parquet(s"$dir/t")
      val scan = spark.read.parquet(s"$dir/t")
      // a predicate over a computed expression parquet cannot evaluate:
      // nothing pushes, the scan decodes everything
      val opaque = scan.filter(sha2($"s", 256).startsWith("a"))
      assert(warningsOf(opaque).exists(_.isInstanceOf[UnpushedScanFilters]))
      // a raw-column comparison pushes — no warning
      assert(!warningsOf(scan.filter($"id" > 50)).exists(_.isInstanceOf[UnpushedScanFilters]))
      // a null GUARD over a computed expression is exempt: Catalyst inserts
      // IsNotNull(f(col)) ahead of joins on computed keys, and the row is
      // decoded for f() regardless — not a selective gate worth a warning
      assert(!warningsOf(scan.filter(sha2($"s", 256).isNotNull))
        .exists(_.isInstanceOf[UnpushedScanFilters]))
    } finally {
      import java.nio.file._
      Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("criticals() is the gate form and severity ordering holds") {
    val l = spark.range(10).toDF("k")
    val r = spark.range(10).toDF("j")
    // desc: range's native ascending order would let EliminateSorts drop an
    // ascending orderBy at optimization time, erasing the Advisory half
    val bad = l.crossJoin(r).orderBy($"k".desc)
    val all = PlanAdvisor.advise(bad)
    assert(all.exists(_.severity == Critical) && all.exists(_.severity == Advisory),
      s"the cross+sort plan carries both severities: $all")
    assert(all.map(_.severity).dropWhile(_ == Critical).forall(_ == Advisory),
      "Critical warnings sort before Advisory")
    assert(PlanAdvisor.criticals(bad).nonEmpty &&
      PlanAdvisor.criticals(bad).forall(_.severity == Critical))
    assert(PlanAdvisor.criticals(
      l.join(r.withColumnRenamed("j", "k"), "k")).isEmpty)
  }

  test("pipeline advisor gate: fail vetoes a Critical plan, log lets it run, off is default") {
    val dir = java.nio.file.Files.createTempDirectory("advisor_pipe").toString
    try {
      spark.range(10).toDF("id").write.parquet(s"$dir/t")
      def cfg(mode: String) =
        s"""{"source": {"type": "parquet", "path": "$dir/t"},
           | "advisor": {"mode": "$mode"}}""".stripMargin
      // an un-keyed self-cross through a transform → Critical
      def cross = (df: org.apache.spark.sql.DataFrame) => df.crossJoin(df.select($"id".as("id2")))
      val vetoed = pipeline.PipelineConfig.fromJson(spark, cfg("fail"))
        .copy(transforms = Seq(cross))
      intercept[GraftPlanError] { vetoed.plan(spark) }
      val logged = pipeline.PipelineConfig.fromJson(spark, cfg("log"))
        .copy(transforms = Seq(cross))
      assert(logged.plan(spark).get.count() == 100, "log mode runs the plan")
      assert(pipeline.PipelineConfig.fromJson(spark, cfg("off")).advisorMode ==
        pipeline.Pipeline.AdvisorOff)
      intercept[GraftConfigError] {
        pipeline.PipelineConfig.fromJson(spark, cfg("loud"))
      }
    } finally {
      import java.nio.file._
      Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
