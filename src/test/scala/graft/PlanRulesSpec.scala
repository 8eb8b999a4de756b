package graft

import graft.plans.PushTsRangeToNanos
import graft.sources.Sources
import org.apache.spark.sql.catalyst.expressions.{Attribute, GreaterThanOrEqual, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Catalyst extension rules: nanos-pushdown rewriting. */
class PlanRulesSpec extends SparkTestBase {

  // raw nanos comparisons: plain long-attribute vs long-literal (the parquet
  // column is still named "ts" pre-rename in the optimized plan)
  private def nsBounds(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[(String, Long)] =
    plan.collect { case Filter(cond, _) =>
      cond.collect {
        case GreaterThanOrEqual(a: Attribute, Literal(v: Long, LongType)) if a.dataType == LongType => (">=", v)
        case LessThan(a: Attribute, Literal(v: Long, LongType)) if a.dataType == LongType => ("<", v)
      }
    }.flatten

  test("PushTsRangeToNanos adds exact ts_ns bounds for a derived-ts range filter") {
    // synthesize the TIMESTAMP(NANOS) source shape the rule targets (a raw
    // epoch-ns long `ts` column) — the driver's testdata has moved to naive
    // µs, but the nanos adapter branch and its rewrite stay supported
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    spark.range(0, 30).select(
      col("id").as("event_id"),
      (lit(1704067200000000000L) + col("id") * 86400L * 1000000000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Sources.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
    // the session runs GraftExtensions, so the optimizer has ALREADY
    // applied the rule by the time the plan is optimized — assert the
    // end-to-end wiring, then the rewrite's exactness on that plan
    val after = df.queryExecution.optimizedPlan
    val bounds = nsBounds(after)
    val loNs = java.time.LocalDateTime.parse("2024-01-05T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    val hiNs = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    assert(bounds.contains((">=", loNs)) && bounds.contains(("<", hiNs)), s"got $bounds")

    // idempotent: a second application changes nothing
    assert(PushTsRangeToNanos(after) == after)

    // semantics preserved: bounds are exact, so row sets agree
    val manual = Sources.pushTsRangeNs(Sources.events(spark, dir),
      Some("2024-01-05 00:00:00"), Some("2024-01-20 00:00:00"))
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
    assert(df.count() == 15L && manual.count() == 15L)
  }

  test("PushNtzTsFilters pushes derived-ts bounds onto the naive-µs scan column") {
    import org.apache.spark.sql.types.TimestampNTZType
    val rawType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assume(rawType == TimestampNTZType, s"testdata events.ts is $rawType, not NTZ")
    val df = Sources.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
    val after = df.queryExecution.optimizedPlan
    val bounds = after.collect { case Filter(cond, _) =>
      cond.collect {
        case GreaterThanOrEqual(a: Attribute, Literal(v: Long, TimestampNTZType)) => (">=", v)
        case LessThan(a: Attribute, Literal(v: Long, TimestampNTZType)) => ("<", v)
      }
    }.flatten
    def micros(s: String): Long = java.time.LocalDateTime.parse(s)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(bounds.contains((">=", micros("2024-01-05T00:00:00"))) &&
      bounds.contains(("<", micros("2024-01-20T00:00:00"))), s"got $bounds")
    // end-to-end: the bounds reach the parquet reader as PushedFilters
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(ts,") && physical.contains("LessThan(ts,"),
      s"bounds must land in PushedFilters:\n${physical.take(2000)}")
    // idempotent
    assert(graft.plans.PushNtzTsFilters(after) == after)
    // the ts_ns (derived long) form unwraps too: pushTsRangeNs alone
    // must produce NTZ-attribute bounds, not post-scan long arithmetic
    val viaNs = Sources.pushTsRangeNs(Sources.events(spark, sfDir),
      Some("2024-01-05 00:00:00"), Some("2024-01-20 00:00:00"))
    val nsPhysical = viaNs.queryExecution.executedPlan.toString
    assert(nsPhysical.contains("GreaterThanOrEqual(ts,") && nsPhysical.contains("LessThan(ts,"),
      s"ts_ns bounds must unwrap to the scan column:\n${nsPhysical.take(2000)}")
    // exactness: both paths agree on the row set
    assert(df.count() ==
      viaNs.filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp")).count())
  }

  test("rule is a no-op when the filter does not bound a derived timestamp") {
    val df = Sources.events(spark, sfDir).filter(col("event_type") === "purchase")
    val plan = df.queryExecution.optimizedPlan
    assert(PushTsRangeToNanos(plan) == plan)
  }

  test("native kernels are SQL-callable once registered (extension function surface)") {
    graft.plans.GraftExtensions.registerInto(spark)
    Tables.embeddings(spark, sfDir).limit(10).createOrReplaceTempView("emb_sql")
    spark.sql(
      """SELECT vec_id, graft_cosine(embedding, embedding) AS c, graft_l2norm(embedding) AS n
        |FROM emb_sql""".stripMargin).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9 && r.getDouble(2) > 0.0)
    }
    val grams = spark.sql("SELECT graft_ngrams(array('a','b','c'), 2) AS g")
      .head().getSeq[String](0)
    assert(grams == Seq("a b", "b c"))
    val fp = spark.sql(
      "SELECT graft_rolling_hash(transform(array('x','y'), t -> xxhash64(t))) AS fp")
      .head().getLong(0)
    assert(fp != 0L)
    // band keys refuse non-divisible / non-positive band counts loudly
    // instead of silently truncating signature rows
    val e = intercept[Exception] {
      spark.sql("SELECT graft_band_keys(array(1L,2L,3L), 2)").collect()
    }
    assert(e.getMessage != null)
  }

  test("repetition_quality stays a scan-stage projection (no Exchange)") {
    // the Gopher repetition signal must never shuffle: all counts are
    // per-row Column algebra over the native shingle kernel
    val plan = SparkEntry.queries("repetition_quality")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats must not shuffle:\n$plan")
  }

  test("unpivot melts wide to long without a shuffle (Expand, no Exchange)") {
    val plan = SparkEntry.queries("unpivot_metrics")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"wide->long reshape must stay a narrow projection:\n$plan")
    assert(plan.contains("Expand"), "unpivot plans as an Expand generator")
  }

  test("quantization and z-order kernels are SQL-callable (graft_* registry)") {
    graft.plans.GraftExtensions.registerInto(spark)
    val row = spark.sql(
      """SELECT graft_quantized_dot(graft_quantize(array(1.0F, -1.0F)),
        |                           graft_quantize(array(1.0F, 1.0F))) AS idot,
        |       graft_quant_scale(array(2.0F, -4.0F)) AS s,
        |       graft_zorder(3L, 1L, 2) AS z""".stripMargin).head()
    assert(row.getLong(0) == 0L, "127*127 + (-127)*127 = 0")
    assert(row.getDouble(1) == 4.0 / 127.0)
    // interleave a=0b11 (even bits), b=0b01 (odd bits) -> 0b0111 = 7
    assert(row.getLong(2) == 7L)
  }

  test("JL projection and projected-space distance are SQL-callable (graft_* registry)") {
    graft.plans.GraftExtensions.registerInto(spark)
    val row = spark.sql(
      """SELECT graft_l2distsq(p, p) AS self,
        |       size(p) AS k, p[0] AS p0
        |FROM (SELECT graft_jl_project(array(1.0F, 2.0F, 3.0F, 4.0F), 4) AS p)""".stripMargin).head()
    assert(row.getDouble(0) == 0.0, "distance to self is exactly zero")
    assert(row.getInt(1) == 4)
    // replay dim 0 of the sign formula over D=4
    val expected = (0 until 4).map { j =>
      val r = (1103515245L * j + 12345L) & 0x7FFFFFFFL
      if (r >= 1073741824L) (j + 1).toDouble else -(j + 1).toDouble
    }.sum
    assert(row.getDouble(2) == expected, s"p0 must replay the LCG signs, got ${row.getDouble(2)}")
  }

  test("packGreedy plans exactly one shuffle (the group repartition)") {
    // the packing pass is a single stateful scan per group: one hash
    // exchange on the group key, a partition-local sort, then mapPartitions
    // — any second exchange would mean the sequential pass re-shuffled
    val plan = SparkEntry.queries("pack_sequences")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges:\n$plan")
    assert(!plan.toLowerCase.contains("exchange rangepartitioning"),
      "partition-local sort must not become a global range sort")
  }

  test("quantized ANN plans as TakeOrderedAndProject over a scan-stage projection") {
    // quantize + integer dot + rescale all run inside the scan stage; top-k
    // is the bounded heap operator, never a global sort
    val plan = SparkEntry.queries("quantized_ann")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must be bounded:\n$plan")
    assert(!plan.contains("SortExec"), s"no global sort in the quantized scan:\n$plan")
  }

  test("per-group top-k plans with rank pushdown (WindowGroupLimit), not a full sort") {
    // stratified_sample and tfidf keep only the top rows per group; Spark's
    // WindowGroupLimit maintains a bounded per-group heap BEFORE the window
    // sort, the difference between sorting k rows and sorting everything
    Seq("stratified_sample", "tfidf_top_terms").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), s"$q should push the rank limit down:\n$plan")
    }
  }

  test("DSv2 connector: filters and required columns arrive AT the connector") {
    import graft.sources.v2.GraftScan
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("graft-parquet").load(s"$sfDir/events.parquet")
      .filter(col("event_type") === "signup" && col("value") > 0.25)
      .select("event_id", "event_type", "value")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("connector scan not planned as BatchScanExec")).asInstanceOf[GraftScan]
    // pushFilters accepted both conjuncts
    val pushed = scan.filters.map(_.toString).mkString(" ")
    assert(pushed.contains("event_type") && pushed.contains("signup"), s"equality not pushed: $pushed")
    assert(pushed.contains("value"), s"range not pushed: $pushed")
    // pruneColumns delivered exactly the projected column set
    assert(scan.readSchema().fieldNames.toSet == Set("event_id", "event_type", "value"),
      s"pruned schema: ${scan.readSchema().fieldNames.mkString(",")}")
    // and the connector's answer matches the native parquet reader's
    val native = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "signup" && col("value") > 0.25)
      .select("event_id", "event_type", "value")
    assert(df.collect().toSet == native.collect().toSet && df.count() > 0)
  }

  test("DSv2 connector: unsupported filters are rejected back to Spark, results stay correct") {
    import graft.sources.v2.GraftScan
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // endswith is not in the connector's evaluable set; the numeric `value`
    // range IS — mixed predicate must split connector/post-scan
    val df = spark.read.format("graft-parquet").load(s"$sfDir/events.parquet")
      .filter(col("event_type").endsWith("up") && col("value") > 0.0)
      .select("event_id", "event_type")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[GraftScan]
    assert(scan.filters.exists(_.references.contains("value")), "value range should be accepted")
    assert(!scan.filters.exists(_.toString.toLowerCase.contains("endswith")),
      "string-match filter must be rejected back to Spark")
    val native = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type").endsWith("up") && col("value") > 0.0)
      .select("event_id", "event_type")
    assert(df.collect().toSet == native.collect().toSet && df.count() > 0)
  }

  test("DSv2 connector splits a multi-row-group file into one partition per row group") {
    // small parquet block size forces many row groups in ONE file — the
    // multi-GB-file shape where file-granularity partitions cap parallelism
    val dir = java.nio.file.Files.createTempDirectory("graft-rowgroups").toString + "/t"
    spark.range(100000L)
      .select(col("id"), (col("id") % 7).as("k"),
        concat(lit("padpadpadpadpadpad-"), col("id")).as("pad"))
      .coalesce(1)
      .write.option("parquet.block.size", "65536").parquet(dir)
    val df = spark.read.format("graft-parquet").load(dir)
    val nParts = df.rdd.getNumPartitions
    assert(nParts > 1, s"one file with many row groups must plan >1 partition, got $nParts")
    // tiling is exact: no row group read twice or dropped
    assert(df.count() == 100000L)
    assert(df.select(org.apache.spark.sql.functions.sum("id")).head().getLong(0) ==
      100000L * 99999L / 2)
    // pushdown still composes with the range read
    val filtered = df.filter(col("k") === 3L).select("id")
    val native = spark.read.parquet(dir).filter(col("k") === 3L).select("id")
    assert(filtered.collect().toSet == native.collect().toSet)
  }

  test("DSv2 connector: null-partition and IN filters evaluate with SQL semantics") {
    import graft.sources.v2.GraftScan
    import org.apache.spark.sql.sources.{EqualTo, In, IsNull}
    // reference semantics of the record-level evaluator, independent of Spark
    def get(m: Map[String, Any])(k: String): Any = m.getOrElse(k, null)
    assert(GraftScan.eval(EqualTo("a", "x"), get(Map("a" -> "x"))))
    assert(!GraftScan.eval(EqualTo("a", "x"), get(Map("a" -> null))), "NULL = x is not true")
    assert(GraftScan.eval(IsNull("a"), get(Map("a" -> null))))
    assert(GraftScan.eval(In("n", Array(1L, 2L)), get(Map("n" -> 2L))))
    assert(!GraftScan.eval(In("n", Array(1L, 2L)), get(Map("n" -> 3L))))
  }

  test("DSv2 connector: staged-commit write round-trips with pushdown intact") {
    import graft.sources.v2.GraftScan
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-v2w").toString + "/t"
    def rows(lo: Long, n: Long) = spark.range(lo, lo + n)
      .select(col("id"), (col("id") % 5).cast("int").as("cat"),
        concat(lit("name-"), col("id")).as("name"), (col("id") * 1.5).as("score"))
    // first write creates the table; second write appends through the same
    // staged-commit path against the now-populated schema
    rows(0, 100).write.format("graft-parquet").mode("append").save(dir)
    rows(100, 50).write.format("graft-parquet").mode("append").save(dir)
    val back = spark.read.format("graft-parquet").load(dir)
      .filter(col("id") >= 40L && col("cat") === 2)
      .select("id", "name")
    val scan = back.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("re-read did not plan the connector scan")).asInstanceOf[GraftScan]
    val pushed = scan.filters.map(_.toString).mkString(" ")
    assert(pushed.contains("id") && pushed.contains("cat"),
      s"filters must reach the connector on the written table: $pushed")
    assert(scan.readSchema().fieldNames.toSet == Set("id", "name"))
    val expect = (0L until 150L).filter(i => i >= 40 && i % 5 == 2).map(i => (i, s"name-$i")).toSet
    assert(back.as[(Long, String)].collect().toSet == expect)
    // a mismatched append is rejected at plan-build time
    intercept[IllegalArgumentException] {
      Seq((1L, "x")).toDF("id", "other").write.format("graft-parquet").mode("append").save(dir)
    }
  }

  test("DSv2 connector: an interrupted write commit is invisible, then rolls forward") {
    import org.apache.hadoop.fs.Path
    import graft.sources.v2.GraftParquetWrite
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-v2r").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.format("graft-parquet").mode("append").save(dir)
    val table = new Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash BEFORE the commit point: staged data, no manifest
    val staging = GraftParquetWrite.stagingDir(table, "crashq")
    fs.mkdirs(staging)
    val staged = new Path(staging, "part-crashq-0-0.parquet")
    Seq((3L, "c")).toDF("id", "name").coalesce(1).write.parquet(staging.toString + "/tmp")
    val part = fs.listStatus(new Path(staging, "tmp"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, staged)
    fs.delete(new Path(staging, "tmp"), true)
    // pre-commit-point data is invisible to readers (underscore staging
    // dir), and a reader never sweeps an unpublished stage
    assert(spark.read.format("graft-parquet").load(dir).count() == 2)
    assert(fs.exists(staged))
    // now the crash lands AFTER the commit point (manifest published): the
    // commit IS committed — the very next read completes the roll-forward
    val man = fs.create(new Path(staging, "manifest"), true)
    try man.write("part-crashq-0-0.parquet".getBytes("UTF-8")) finally man.close()
    assert(spark.read.format("graft-parquet").load(dir).count() == 3,
      "a published commit must be healed by the read, not stay torn")
    assert(!fs.exists(staging))
    // a crash BEFORE the commit point (no manifest) is garbage, but under
    // optimistic concurrency NOBODY sweeps it at write time — it may be a
    // LIVE concurrent appender's stage. The next write commits cleanly
    // alongside it; grace-gated vacuum reclaims it once it has aged.
    val dead = GraftParquetWrite.stagingDir(table, "deadq")
    fs.mkdirs(dead)
    Seq((4L, "d")).toDF("id", "name").write.format("graft-parquet").mode("append").save(dir)
    assert(fs.exists(dead), "a write must not sweep a possibly-live stage")
    assert(spark.read.format("graft-parquet").load(dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(graft.sources.v2.GraftTableOptimize.fsck(spark, dir).stagingGarbage == 1)
    graft.sources.v2.GraftTableOptimize.vacuum(spark, dir, graceMs = 0L): Unit
    assert(!fs.exists(dead), "aged unmanifested staging is vacuum's to reclaim")
  }

  test("rule does not fire when ts_ns was projected away below the filter") {
    val df = Sources.events(spark, sfDir)
      .select("event_id", "ts")
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
    // after optimization ts_ns may not flow through the filter's child;
    // whatever the shape, applying the rule must keep the plan resolvable
    val plan = df.queryExecution.optimizedPlan
    val rewritten = PushTsRangeToNanos(plan)
    assert(rewritten.resolved)
  }
}
