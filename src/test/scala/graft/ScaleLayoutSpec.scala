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
