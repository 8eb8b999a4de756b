package graft

import graft.operators.Joins
import graft.sinks.Sinks
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-layout levers for cluster scale: salting, partition pruning,
  * bucketed shuffle-free joins. Each test asserts both the RESULT and the
  * PLAN property that makes the technique worth using.
  */
class ScaleLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    val skewed = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Joins.saltedJoin(skewed, dim, Seq("k"), factor = 8).select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("partitioned write prunes directories for partition-column predicates") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Sources.events(spark, sfDir).drop("ts_ns")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    Sinks.writePartitioned(ev, dir, Seq("event_type", "day"))
    val back = spark.read.parquet(dir).filter($"event_type" === "purchase" && $"day" === "2024-01-05")
    val expected = ev.filter($"event_type" === "purchase" && $"day" === "2024-01-05").count()
    assert(back.count() == expected && expected > 0)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("isnotnull(event_type") || plan.contains("event_type")),
      s"partition filters missing from plan:\n$plan")
  }

  test("dynamic partition pruning fires when the partition filter is only known at runtime") {
    // the 100 TB star-join behavior nothing static can replace: the fact
    // table is partitioned by a dim-derived key, the dim filter is on a
    // NON-key attribute, so the set of fact partitions to read is only
    // knowable after the dim side is evaluated — DPP must inject a
    // dynamicpruning subquery into the fact scan's partition filters
    // instead of reading every partition
    val dir = Files.createTempDirectory("graft-dpp").toString + "/events"
    val ev = Sources.events(spark, sfDir).drop("ts_ns")
    Sinks.writePartitioned(ev, dir, Seq("event_type"))
    // dim: one row per event_type with an attribute; the filter on the
    // attribute selects types the fact scan cannot know statically
    val dim = ev.select($"event_type").distinct()
      .withColumn("is_rare", $"event_type".isin("error", "refund"))
    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim.filter($"is_rare"), Seq("event_type"))
    val expected = ev.join(dim.filter($"is_rare"), Seq("event_type")).count()
    assert(joined.count() == expected && expected > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic-pruning subquery in the fact scan's partition filters:\n$plan")
  }

  test("runtime bloom-filter join pruning injects a probe into the big side's scan") {
    // the non-partitioned complement of DPP: a selective dim joined to a
    // large fact on a NON-partition column cannot prune directories, but
    // Spark's runtime bloom filter (built from the dim's join keys) must
    // land in the fact scan's filters so row groups still skip. Thresholds
    // lowered to the test scale; the assertion is the mechanism, which is
    // size-independent.
    val dir = Files.createTempDirectory("graft-rbf").toString
    Sources.events(spark, sfDir).drop("ts_ns").write.parquet(s"$dir/fact")
    Sources.events(spark, sfDir).select($"user_id").distinct()
      .filter($"user_id" % 97 === 0)
      .write.parquet(s"$dir/dim")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // broadcast off: with a broadcast join Spark may prefer its own
      // broadcast-side filtering; the bloom path is the shuffled-join one
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.read.parquet(s"$dir/fact")
      // InjectRuntimeFilter only fires when the creation side carries a
      // LIKELY-SELECTIVE predicate in the QUERY (a literal comparison —
      // pre-filtering the files at write time is invisible to the rule)
      val dim = spark.read.parquet(s"$dir/dim").filter($"user_id" >= 0)
      val joined = fact.join(dim, Seq("user_id"))
      val expected = Sources.events(spark, sfDir).drop("ts_ns")
        .filter($"user_id" % 97 === 0).count()
      assert(joined.count() == expected && expected > 0)
      val plan = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom probe reached the fact side:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("ORC sink roundtrips the frame") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/orders"
    val o = Tables.orders(spark, sfDir)
    Sinks.writeOrc(o, dir)
    val back = spark.read.orc(dir)
    assert(back.count() == o.count())
    assert(back.schema == o.schema)
  }

  test("range-clustered write gives each file a tight, non-overlapping key range") {
    val dir = Files.createTempDirectory("graft-sorted").toString + "/orders"
    Sinks.writeSorted(Tables.orders(spark, sfDir), dir, Seq("o_orderdate"))
    val back = spark.read.parquet(dir)
    assert(back.count() == Tables.orders(spark, sfDir).count())
    // per-file min/max ranges must not overlap (that is what makes row-group
    // stats selective for range predicates)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1.toString)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(!lo2.isBefore(hi1), s"overlap: $hi1 vs $lo2")
      case _ => ()
    }
  }

  test("z-ordered write bounds per-file spans on BOTH dimensions at once") {
    import spark.implicits._
    // two independent uniform dimensions — the case 1-D range clustering
    // cannot serve (sorting by x leaves every file spanning all of y)
    val n = 100000L
    val data = spark.range(n).select(
      pmod(xxhash64($"id"), lit(10000L)).cast("double").as("x"),
      pmod(xxhash64($"id", lit(7)), lit(10000L)).cast("double").as("y"),
      $"id".as("payload"))
    val zDir = Files.createTempDirectory("graft-z").toString + "/t"
    val plainDir = Files.createTempDirectory("graft-plain").toString + "/t"
    Sinks.writeZOrdered(data, zDir, "x", "y", targetFiles = 16)
    data.repartition(16).write.parquet(plainDir)

    def fileRanges(dir: String): Seq[(Double, Double, Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("xlo"), max("x").as("xhi"), min("y").as("ylo"), max("y").as("yhi"))
        .collect().toSeq
        .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    def avgSpan(rs: Seq[(Double, Double, Double, Double)]): Double =
      rs.map { case (xl, xh, yl, yh) => ((xh - xl) + (yh - yl)) / 2.0 / 10000.0 }.sum / rs.size

    val zRanges = fileRanges(zDir)
    val plainRanges = fileRanges(plainDir)
    assert(spark.read.parquet(zDir).count() == n, "clustering must not lose rows")
    // 16 files x 8-bit buckets: each file fixes >= 2 high bits per dimension
    // -> spans near 1/4 of the domain; random placement spans nearly all of it
    assert(avgSpan(zRanges) < 0.55, f"z-order spans ${avgSpan(zRanges)}%.2f — clustering broke")
    assert(avgSpan(plainRanges) > 0.8, "the unclustered baseline should span the domain")

    // the operational claim: a small box predicate on BOTH dims intersects
    // few z-ordered files (min/max stats prune the rest) but every plain file
    def touched(rs: Seq[(Double, Double, Double, Double)]): Int =
      rs.count { case (xl, xh, yl, yh) => xl <= 2500 && xh >= 0 && yl <= 2500 && yh >= 0 }
    assert(touched(zRanges) <= zRanges.size / 2,
      s"box query should touch a minority of z-ordered files: ${touched(zRanges)}/${zRanges.size}")
    assert(touched(plainRanges) == plainRanges.size,
      "the unclustered layout cannot prune the box query")
  }

  test("tables bucketed on the join key join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle decision
    try {
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      Sinks.writeBucketed(o.withColumnRenamed("o_custkey", "custkey"), "graft_orders_b", Seq("custkey"), 8)
      Sinks.writeBucketed(c.withColumnRenamed("c_custkey", "custkey"), "graft_customer_b", Seq("custkey"), 8)
      val joined = spark.table("graft_orders_b").join(spark.table("graft_customer_b"), Seq("custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    }
  }
}
