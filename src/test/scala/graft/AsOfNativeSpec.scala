package graft

import graft.operators.Joins
import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native as-of join ([[graft.plans.AsOfJoinExec]]) — tier (c) of the
  * custom-operator ladder. The ground truth is the composed
  * union-and-forward-fill form ([[Joins.asOfJoin]]), itself oracle-exact
  * against DuckDB's ASOF JOIN in the driver gate; the native operator must
  * be row-identical to it under every partitioning.
  */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val events = Sources.events(spark, sfDir)
  private lazy val purchases = events
    .filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts"),
      col("event_id").as("purchase_event_id"), col("value").as("purchase_value"))

  private def composed(l: DataFrame, r: DataFrame): DataFrame =
    Joins.asOfJoin(l, r, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id")
  private def native(l: DataFrame, r: DataFrame): DataFrame =
    Joins.asOfJoinNative(l, r, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id")

  test("native as-of equals the composed form on the events fixture (self as-of)") {
    val l = events.select("event_id", "user_id", "ts")
    val a = canon(composed(l, purchases))
    val b = canon(native(l, purchases))
    assert(a.nonEmpty, "fixture must produce matches")
    assert(a == b)
  }

  test("native as-of is partitioning-independent") {
    val l = events.select("event_id", "user_id", "ts")
    val base = canon(native(l, purchases))
    for (n <- Seq(1, 3, 32)) {
      val got = canon(native(l.repartition(n), purchases.repartition(n + 1)))
      assert(got == base, s"diverged at repartition($n)")
    }
  }

  test("same-instant right rows match (<= semantics) and ties pre-collapse by tiebreak") {
    val l = Seq((1L, 10L, 100L), (1L, 50L, 50L)).toDF("k", "lid", "ts")
      .select(col("k"), col("lid"), timestamp_micros(col("ts")).as("ts"))
    // two right rows at the SAME (key, ts): keep-first by tiebreak wins
    val r = Seq((1L, 100L, "late"), (1L, 100L, "early"), (1L, 40L, "old"))
      .toDF("k", "ts", "tag")
      .select(col("k"), timestamp_micros(col("ts")).as("ts"), col("tag"))
    val out = Joins.asOfJoinNative(l, r, Seq("k"), "ts", "ts", Seq("tag"), "tag")
      .select("lid", "tag").as[(Long, String)].collect().toMap
    assert(out(10L) == "early", "same-instant matches; tiebreak keeps first")
    assert(out(50L) == "old", "only at-or-before rows match")
    assert(out.size == 2)
  }

  test("left rows with no prior right row drop (inner as-of); empty right yields empty") {
    val l = Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("k", "lid", "ts")
      .select(col("k"), col("lid"), timestamp_micros(col("ts")).as("ts"))
    val r = Seq((1L, 3L, "x")).toDF("k", "ts", "tag")
      .select(col("k"), timestamp_micros(col("ts")).as("ts"), col("tag"))
    val out = Joins.asOfJoinNative(l, r, Seq("k"), "ts", "ts", Seq("tag"), "tag")
    assert(out.select("lid").as[Long].collect().toSeq == Seq(1L))
    val empty = Joins.asOfJoinNative(l, r.filter(lit(false)), Seq("k"), "ts", "ts",
      Seq("tag"), "tag")
    assert(empty.isEmpty)
  }

  test("plans as AsOfJoinExec: co-partitioned key exchanges + in-partition sorts") {
    val l = events.select("event_id", "user_id", "ts")
    // AQE off: node/exchange pins need the planning-time plan, not an
    // AdaptiveSparkPlan wrapper (same convention as PlanGuardSpec)
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try native(l, purchases).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    val nodes = plan.collect { case e: graft.plans.AsOfJoinExec => e }
    assert(nodes.size == 1, s"native node missing:\n$plan")
    // both children of the merge must be sorted in-partition (never global)
    nodes.head.children.foreach { c =>
      val sorts = c.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.nonEmpty, s"child of AsOfJoinExec not sorted:\n$c")
      assert(!sorts.head.global, "child sort must be in-partition")
    }
    // 3 exchanges total: the two key exchanges feeding the merge + the
    // (key, ts) exchange inside the deterministic tiebreak pre-dedup
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 3, s"expected 3 exchanges, got ${exchanges.size}:\n$plan")
  }

  test("forward native equals the composed forward form (next-event lookup)") {
    val l = events.select("event_id", "user_id", "ts")
    val a = canon(Joins.asOfJoinForward(l, purchases, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id"))
    val b = canon(Joins.asOfJoinForwardNative(l, purchases, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id"))
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("forward native: same-instant matches, only at-or-after rows, earliest wins") {
    val l = Seq((1L, 10L, 100L), (1L, 50L, 150L)).toDF("k", "lid", "ts")
      .select(col("k"), col("lid"), timestamp_micros(col("ts")).as("ts"))
    val r = Seq((1L, 100L, "now"), (1L, 120L, "soon"), (1L, 400L, "far"))
      .toDF("k", "ts", "tag")
      .select(col("k"), timestamp_micros(col("ts")).as("ts"), col("tag"))
    val out = Joins.asOfJoinForwardNative(l, r, Seq("k"), "ts", "ts", Seq("tag"), "tag")
      .select("lid", "tag").as[(Long, String)].collect().toMap
    assert(out(10L) == "now", "same-instant right row matches (>= semantics)")
    assert(out(50L) == "far", "earliest at-or-after wins, not the latest")
    assert(out.size == 2)
  }

  test("one hot key (every row the same key) stays O(1) state and matches composed") {
    // the skew case a buffering join degrades on: 10k left rows and 2k
    // right rows all sharing ONE key land in one partition; the merge must
    // stream it with a single buffered right row, and the result must still
    // equal the composed form
    val l = spark.range(10000).select(
      lit(7L).as("k"), col("id").as("lid"),
      timestamp_micros(col("id") * 10L).as("ts"))
    val r = spark.range(2000).select(
      lit(7L).as("k"), timestamp_micros(col("id") * 50L).as("ts"),
      col("id").as("rid"))
    val a = canon(Joins.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid"))
    val b = canon(Joins.asOfJoinNative(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid"))
    assert(a == b)
    assert(b.size == 10000, "right ts=0 exists, so every left row matches")
  }

  test("key-bucketed inputs as-of join with ZERO exchanges (the pre-paid shuffle)") {
    // the scaladoc's cluster claim, proven: both sides bucketed on the key
    // satisfy the merge's ClusteredDistribution AND the tiebreak pre-dedup's
    // (key, ts) clustering (key ⊆ clustering keys), so the whole native
    // as-of plans without a single shuffle — the bucketed-fact-table idiom
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val l = events.select("event_id", "user_id", "ts")
      graft.sinks.Sinks.writeBucketed(l, "graft_asof_l_b", Seq("user_id"), 8)
      graft.sinks.Sinks.writeBucketed(purchases, "graft_asof_r_b", Seq("user_id"), 8)
      val out = Joins.asOfJoinNative(
        spark.table("graft_asof_l_b"), spark.table("graft_asof_r_b"),
        Seq("user_id"), "ts", "ts",
        Seq("purchase_event_id", "purchase_value"), "purchase_event_id")
      val exchanges = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed as-of must not shuffle:\n${out.queryExecution.executedPlan}")
      assert(canon(out) == canon(composed(l, purchases)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      spark.sql("DROP TABLE IF EXISTS graft_asof_l_b")
      spark.sql("DROP TABLE IF EXISTS graft_asof_r_b")
    }
  }

  test("native as-of survives AQE re-planning with identical results") {
    val l = events.select("event_id", "user_id", "ts")
    val base = canon(native(l, purchases))
    withAqe { assert(canon(native(l, purchases)) == base) }
  }

  private def withAqe[A](f: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try f finally spark.conf.set(key, old)
  }
}
