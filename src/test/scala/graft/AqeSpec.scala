package graft

import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE-ON plan tier. The exchange-count pins elsewhere run with adaptive
  * execution disabled for determinism; production ([[GraftSession]]) runs
  * AQE ON. This tier asserts the properties that must SURVIVE runtime
  * re-planning: no join on the surface may degrade to a nested-loop under
  * AQE's broadcast demotions, the skew-join splitter must actually fire on
  * a hot-key fixture (it is the first line of defense before manual
  * salting), and partition coalescing must not collapse a salted join's
  * parallelism back into the hot partition the salt exists to spread.
  */
class AqeSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach { case (k, o) => o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** Execute and render the FINAL adaptive plan (isFinalPlan=true). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private val aqeOn = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")

  test("AQE re-planning keeps the join family off nested-loop plans") {
    // every join-shaped query NOT on PlanGuardSpec's bounded-cross allowlist
    // (those legitimately broadcast a <=k-row side as a nested-loop cross);
    // a tiny advisory size forces real re-planning decisions at test scale
    val joins = Seq(
      "q3_topk_join", "asof_join", "asof_join_forward", "range_join",
      "interval_overlap_join", "salted_join_agg", "pit_status_lookup",
      "null_safe_join", "semi_join", "anti_join", "broadcast_join_agg",
      "flagship_events", "scd2_history", "entity_resolution")
    withConf(aqeOn :+ ("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k"): _*) {
      joins.foreach { q =>
        val plan = finalPlan(SparkEntry.queries(q)(spark, sfDir))
        assert(!plan.contains("BroadcastNestedLoop"),
          s"$q degraded to a nested-loop join under AQE re-planning")
      }
    }
  }

  /** The shared adaptive-plan walk ([[graft.plans.PlanWalk]]). */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.plans.PlanWalk.flatten(p)

  test("AQE keeps planning the native as-of join: node survives, exchange count holds") {
    // the custom AsOfJoinExec must not be re-shaped away or wrapped in
    // extra exchanges when AQE re-plans: the final adaptive plan keeps
    // exactly one native node and the same 3 shuffles the AQE-off pin
    // records (two co-partitioned key exchanges + the tiebreak pre-dedup)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    withConf(aqeOn :+ ("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k"): _*) {
      val df = SparkEntry.queries("asof_join_native")(spark, sfDir)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val native = nodes.collect { case e: graft.plans.AsOfJoinExec => e }
      assert(native.size == 1,
        s"AsOfJoinExec fell out of the plan under AQE:\n${df.queryExecution.executedPlan}")
      val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 3,
        s"AQE changed the as-of exchange count to ${shuffles.size} (pinned 3):\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("AQE adds no exchange to the native as-of join on bucketed inputs") {
    // the pre-paid-shuffle contract must hold under runtime re-planning
    // too: both sides bucketed on the key, AQE ON — still zero shuffles
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val events = graft.sources.Sources.events(spark, sfDir)
    val l = events.select(col("event_id"), col("user_id"), col("ts"))
    val r = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"), col("value").as("purchase_value"))
    graft.sinks.Sinks.writeBucketed(l, "graft_aqe_asof_l", Seq("user_id"), 8)
    graft.sinks.Sinks.writeBucketed(r, "graft_aqe_asof_r", Seq("user_id"), 8)
    try withConf(aqeOn: _*) {
      val out = Joins.asOfJoinNative(
        spark.table("graft_aqe_asof_l"), spark.table("graft_aqe_asof_r"),
        Seq("user_id"), "ts", "ts",
        Seq("purchase_event_id", "purchase_value"), "purchase_event_id")
      assert(out.count() > 0)
      val nodes = flatten(out.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]),
        s"native node missing under AQE:\n${out.queryExecution.executedPlan}")
      val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed as-of gained ${shuffles.size} exchange(s) under AQE:\n" +
          out.queryExecution.executedPlan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_aqe_asof_l")
      spark.sql("DROP TABLE IF EXISTS graft_aqe_asof_r")
    }
  }

  test("AQE skew-join splits the hot partition of a sort-merge join") {
    withConf(aqeOn ++ Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"): _*) {
      // 90% of the left lands on key 0: one reducer far past threshold and
      // factor x the median — the skew rule MUST split it
      val left = spark.range(0, 100000)
        .select(when(pmod(col("id"), lit(10)) =!= 0, lit(0L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val plan = finalPlan(left.join(right, "k"))
      assert(plan.contains("SortMergeJoin"), s"fixture must plan a sort-merge join:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }

  test("AQE coalescing keeps a salted join spread across multiple partitions") {
    withConf(aqeOn ++ Seq(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      // the 1 MB minPartitionSize default is a FLOOR on coalesced output —
      // at test scale it would legitimately merge everything (tiny data
      // needs no parallelism); lowering it makes the advisory size the
      // operative target, which is the cluster-scale regime
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32"): _*) {
      // ONE hot key with an incompressible payload: unsalted, every row
      // meets in a single reducer no matter what AQE does; salted with
      // factor 8, each slice is far over the advisory size, so merging the
      // spread back would violate AQE's own size target. The 8 salt values
      // land in 7 distinct murmur buckets of 32 (3 collides pairwise), so
      // the surviving parallelism is 7 — assert it on the SAME execution
      // (each fresh action re-runs AQE and may coalesce differently).
      val left = spark.range(0, 50000).select(lit(0L).as("k"),
        concat((1 to 4).map(i => md5(concat(col("id"), lit(s"p$i")))): _*).as("v"))
      val right = Seq((0L, "x")).toDF("k", "w")
      val out = Joins.saltedJoin(left, right, Seq("k"), factor = 8)
      val parts = out.rdd.getNumPartitions
      assert(parts >= 6,
        s"the 8-way salt spread collapsed to $parts partitions under AQE coalescing")
      assert(out.count() == 50000)
    }
  }
}
