package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches the most recent prior right row, >= semantics, inner drop") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:05:00")), // after p1
      (2L, 10L, ts("2024-01-01 00:10:00")), // exactly at p2 -> matches p2
      (3L, 10L, ts("2024-01-01 00:20:00")), // after p2
      (4L, 20L, ts("2024-01-01 00:01:00")), // user 20 has no purchase -> dropped
      (5L, 10L, ts("2023-12-31 23:00:00"))  // before any purchase -> dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (10L, ts("2024-01-01 00:10:00"), 200L, 2.0)
    ).toDF("user_id", "ts", "purchase_event_id", "purchase_value")

    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id")
      .select($"event_id", $"purchase_event_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 100L, 2L -> 200L, 3L -> 200L))
  }

  test("asOfJoinForward attaches the earliest at-or-after right row, inner drop") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:05:00")), // next is p2
      (2L, 10L, ts("2024-01-01 00:10:00")), // exactly at p2 -> matches p2
      (3L, 10L, ts("2024-01-01 00:20:00")), // nothing after -> dropped
      (4L, 20L, ts("2024-01-01 00:01:00")), // user 20 has no purchase -> dropped
      (5L, 10L, ts("2023-12-31 23:00:00"))  // before everything -> next is p1
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (10L, ts("2024-01-01 00:10:00"), 200L, 2.0)
    ).toDF("user_id", "ts", "purchase_event_id", "purchase_value")

    val out = Joins.asOfJoinForward(left, right, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id")
      .select($"event_id", $"purchase_event_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 200L, 2L -> 200L, 5L -> 100L))
  }

  test("asOfJoin breaks same-instant right ties deterministically (keep smallest tiebreak)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:01"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 300L, 3.0),
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0)
    ).toDF("user_id", "ts", "purchase_event_id", "purchase_value")
    val out = Joins.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("purchase_event_id", "purchase_value"), "purchase_event_id").head()
    assert(out.getAs[Long]("purchase_event_id") == 100L)
  }

  test("timeRangeJoin is half-open and survives bucket boundaries") {
    val width = 30L * 60 * 1000000 // 30 min
    val anchors = Seq((10L, ts("2024-01-01 00:50:00"), 1L)).toDF("user_id", "p_ts", "purchase_id")
    val points = Seq(
      (10L, ts("2024-01-01 00:49:59"), -1.0), // before -> out
      (10L, ts("2024-01-01 00:50:00"), 1.0),  // inclusive lower
      (10L, ts("2024-01-01 01:05:00"), 2.0),  // crosses the 01:00 bucket line
      (10L, ts("2024-01-01 01:19:59"), 3.0),  // last in-window instant
      (10L, ts("2024-01-01 01:20:00"), -2.0), // exclusive upper
      (20L, ts("2024-01-01 00:55:00"), -3.0)  // other key
    ).toDF("user_id", "ts", "value")
    val out = Joins.timeRangeJoin(anchors, points, Seq("user_id"), "p_ts", "ts", 0L, width)
      .select("value").as[Double].collect().sorted.toSeq
    assert(out == Seq(1.0, 2.0, 3.0))
  }

  test("range join matches the plain inequality-join semantics on real data") {
    val ev = graft.sources.Sources.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val bucketed = Joins.timeRangeJoin(
      purchases, ev.select($"user_id", $"ts", $"event_id"),
      Seq("user_id"), "p_ts", "ts", 0L, 30L * 60 * 1000000)
      .select("purchase_id", "event_id").as[(Long, Long)].collect().toSet
    val naive = purchases.join(ev.select($"user_id", $"ts", $"event_id"), Seq("user_id"))
      .filter(unix_micros($"ts") >= unix_micros($"p_ts") &&
        unix_micros($"ts") < unix_micros($"p_ts") + 30L * 60 * 1000000)
      .select("purchase_id", "event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("pointInTimeJoin attaches the version true at each fact's timestamp") {
    val history = Seq(
      // k=1: A over [1,5), B over [5,∞); k=2: X over [2,∞)
      (1L, "A", 1, Option(5)), (1L, "B", 5, Option.empty[Int]),
      (2L, "X", 2, Option.empty[Int]))
      .toDF("k", "status", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, 1),  // at A's open instant → A
      (11L, 1L, 4),  // inside [1,5) → A
      (12L, 1L, 5),  // at the boundary: half-open → B
      (13L, 2L, 9),  // current version → X
      (14L, 2L, 1),  // BEFORE the key's first version → no match
      (15L, 3L, 1))  // unknown key → no match
      .toDF("fact_id", "k", "ts")
    val inner = Joins.pointInTimeJoin(facts, history, Seq("k"), "ts")
      .select($"fact_id", $"status").as[(Long, String)].collect().toMap
    assert(inner == Map(10L -> "A", 11L -> "A", 12L -> "B", 13L -> "X"))
    val left = Joins.pointInTimeJoin(facts, history, Seq("k"), "ts", how = "left")
      .select($"fact_id", $"status").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(left(14L).isEmpty && left(15L).isEmpty && left.size == 6,
      "left join surfaces pre-history facts and unknown keys as nulls")
  }

  test("intervalOverlapJoin: overlap semantics — touching is empty, containment matches once") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")),
      (3L, ts("2024-01-01 09:00:00"), ts("2024-01-02 09:00:00"))  // spans 24 buckets
    ).toDF("lid", "ls", "le")
    val r = Seq(
      (10L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00")), // inside 1 and 3
      (11L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // touches 1 (half-open: no overlap), inside 3
      (12L, ts("2024-01-01 08:00:00"), ts("2024-01-02 08:00:00"))  // long: overlaps 1, 2, 3
    ).toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(l, r, Seq.empty, "ls", "le", "rs", "re",
        widthMicros = 3600L * 1000000)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 12L), (2L, 12L), (3L, 10L), (3L, 11L), (3L, 12L)),
      s"got $got — exactly one row per overlapping pair, touching intervals excluded")
  }

  test("intervalOverlapJoin: keys scope the pair space; empty intervals match nothing") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("b", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"))  // empty: end == start
    ).toDF("k", "ls", "le")
    val r = Seq(
      ("a", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")),
      ("b", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")),
      ("c", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00"))
    ).toDF("k", "rs", "re")
    val got = Joins.intervalOverlapJoin(l, r, Seq("k"), "ls", "le", "rs", "re",
        widthMicros = 3600L * 1000000)
      .select("k").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a"), s"same-key overlap only, empty left interval dropped: $got")
  }

  test("intervalOverlapJoin: a pathological outlier interval fails typed, not a silent 8000× explode") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val hour = 3600L * 1000000
    val l = (Seq.tabulate(20)(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), ts(f"2024-01-01 ${i % 24}%02d:45:00"))) :+
      ((99L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))) // ~8760 buckets at 1h
      .toDF("lid", "ls", "le")
    val r = Seq((1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 00:40:00"))).toDF("rid", "rs", "re")
    val e = intercept[Exception](
      Joins.intervalOverlapJoin(l, r, Seq.empty, "ls", "le", "rs", "re", hour).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBucketsPerRow")), s"got: ${msgs(e)}")
    // the caller's documented outs both work: a wider bucket, or a raised cap
    assert(Joins.intervalOverlapJoin(l, r, Seq.empty, "ls", "le", "rs", "re",
      widthMicros = 30L * 24 * hour).count() == 2)
    val raised = Joins.intervalOverlapJoin(l, r, Seq.empty, "ls", "le", "rs", "re",
      hour, maxBucketsPerRow = 10000)
    assert(raised.count() == 2, "normal session + year-long outlier both overlap the probe")
  }

  test("NOT IN plans the null-aware anti join and keeps NULL-in-subquery semantics") {
    // the fast LeftAnti rewrite is WRONG for NOT IN when the subquery can
    // yield NULL (SQL three-valued logic: one NULL empties the result);
    // Spark must plan BroadcastHashJoin's null-aware variant
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("not_in_null_aware")(spark, sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.exists(_.isNullAwareAntiJoin),
      s"NOT IN must plan the null-aware anti join:\n$plan")
    // the trap itself, pinned on a fixture where it bites
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("nn_l")
    Seq(Option(1L), None).toDF("k").createOrReplaceTempView("nn_r")
    assert(spark.sql(
      "SELECT * FROM nn_l WHERE k NOT IN (SELECT k FROM nn_r)").count() == 0,
      "one NULL in the subquery must empty a NOT IN result")
    assert(spark.sql(
      "SELECT * FROM nn_l WHERE k NOT IN (SELECT k FROM nn_r WHERE k IS NOT NULL)")
      .count() == 1)
  }

  test("bucketed temporal joins reject inputs that carry the reserved temp columns") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 7L))
      .toDF("lid", "ls", "le", "__bucket")
    val r = Seq((10L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))).toDF("rid", "rs", "re")
    val e1 = intercept[IllegalArgumentException](
      Joins.intervalOverlapJoin(l, r, Seq.empty, "ls", "le", "rs", "re", 3600L * 1000000))
    assert(e1.getMessage.contains("__bucket") && e1.getMessage.contains("left"))
    val e2 = intercept[IllegalArgumentException](
      Joins.timeRangeJoin(
        Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "a_ts"),
        Seq((1L, ts("2024-01-01 10:00:00"), 3L)).toDF("k", "b_ts", "__lb0"),
        Seq("k"), "a_ts", "b_ts", 0L, 1000000L))
    assert(e2.getMessage.contains("__lb0") && e2.getMessage.contains("right"))
  }
}
