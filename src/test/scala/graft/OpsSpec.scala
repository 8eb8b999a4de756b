package graft

import graft.operators.Ops
import graft.types._
import org.apache.spark.sql.functions._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "2024-01-01 00:00:00", "a", "x"),
    (2L, "2024-01-02 00:00:00", "a", "y"),
    (3L, "2024-01-03 00:00:00", "b", null),
    (4L, "2024-01-04 00:00:00", "b", "z")
  ).toDF("id", "ts", "k", "v").withColumn("ts", to_timestamp($"ts"))

  test("rangeFilter applies half-open window only when both bounds present") {
    val both = Ops.rangeFilter("ts", Some("2024-01-01 00:00:00"), Some("2024-01-03 00:00:00"))(df)
    assert(both.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L)) // end exclusive
    val one = Ops.rangeFilter("ts", Some("2024-01-03 00:00:00"), None)(df)
    assert(one.count() == 4) // match_all fallback
  }

  test("termFilters are conjunctive equality predicates") {
    val out = Ops.termFilters(Seq("k" -> "b", "v" -> "z"))(df)
    assert(out.select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("selectColumns strict raises on missing, lenient skips") {
    intercept[IllegalArgumentException] { Ops.selectColumns(Seq("id", "nope"))(df) }
    assert(Ops.selectColumns(Seq("id", "nope"), strict = false)(df).columns.toSeq == Seq("id"))
  }

  test("project substitutes the string placeholder for missing values (reference NULL-string semantics)") {
    val out = Ops.project(Seq(FieldSpec("ident", "id"), FieldSpec("val", "v")))(df)
      .orderBy("ident").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "y", "NULL", "z"))
  }

  test("notNullCheck fails on nulls in required fields and passes otherwise") {
    intercept[IllegalStateException] { Ops.notNullCheck(Seq("v"))(df) }
    assert(Ops.notNullCheck(Seq("id"))(df).count() == 4)
  }

  test("dedupKeepFirst keeps first row per key under orderBy + tiebreak") {
    val out = Ops.dedupKeepFirst(DedupSpec(Seq("k"), Seq("ts"), Some($"id")))(df)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("castWith coerce nulls bad values; ignore keeps the original string") {
    val src = Seq(("1", "x"), ("oops", "y")).toDF("n", "tag")
    val coerced = Ops.castWith(Seq(TypeSpec("n", "int")))(src)
    assert(coerced.select("n").collect().map(r => Option(r.get(0))).toSeq == Seq(Some(1), None))
    val ignored = Ops.castWith(Seq(TypeSpec("n", "int", CastIgnore)))(src)
    assert(ignored.select("n").as[String].collect().toSeq == Seq("1", "oops"))
  }

  test("enrichFn splats registry-function struct results into mapped output columns") {
    val src = Seq(("2024-05-06T07:08:09.123456+00:00", 1)).toDF("iso", "n")
    val out = Ops.enrichFn(FnField("iso_to_dict",
      Map("iso_time" -> "iso"), Map.empty,
      Map("datetime" -> "dt", "microseconds" -> "mcs", "month" -> "m")))(src)
    val row = out.select("dt", "mcs", "m").head()
    assert(row.getString(0) == "2024-05-06 07:08:09")
    assert(row.getInt(1) == 123456)
    assert(row.getString(2) == "2024-05-01")
  }

  test("native iso_to_dict preserves the allowEmpty contract through codegen") {
    // the native expression must feed null/empty INTO the parser (allowEmpty
    // decides the behavior), not null-propagate around it
    val src = Seq(Some("2024-05-06T07:08:09.123456+00:00"), Some(""), None).toDF("iso")
    val lenient = Ops.enrichFn(FnField("iso_to_dict",
      Map("iso_time" -> "iso"), Map("allow_empty" -> "true"),
      Map("datetime" -> "dt", "microseconds" -> "mcs")))(src)
    val rows = lenient.select("dt", "mcs").collect()
    assert(rows(0).getString(0) == "2024-05-06 07:08:09" && rows(0).getInt(1) == 123456)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // empty -> nulls
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1)) // null -> nulls
    val strict = Ops.enrichFn(FnField("iso_to_dict",
      Map("iso_time" -> "iso"), Map.empty,
      Map("datetime" -> "dt")))(src)
    // thrown raw from the codegen'd kernel — the reference's strict contract
    intercept[graft.functions.TimeFunctions.EmptyValueException] { strict.collect() }
  }

  test("enrichFn rejects names outside the registry whitelist") {
    intercept[IllegalArgumentException] {
      Ops.enrichFn(FnField("rm_rf", Map.empty, Map.empty, Map("x" -> "x")))(df)
    }
  }

  test("query composes window + terms + projection + sort like ElasticQueryModel") {
    val out = Ops.query(QuerySpec(
      rangeField = Some("ts"),
      start = Some("2024-01-01 00:00:00"), end = Some("2024-01-05 00:00:00"),
      filters = Seq("k" -> "a"),
      sourceFields = Some(Seq("id", "k")),
      sortBy = Seq(("id", false))))(df)
    assert(out.columns.toSeq == Seq("id", "k"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(2L, 1L))
  }

  test("resampleForward: aligned grid, forward fill, ties keep-first, sub-step keys vanish") {
    val obs = Seq(
      // key "a": obs at 5 and 25 -> grid {10, 20}, both inherit t=5's value
      ("a", 5L, 1L, 1.5), ("a", 25L, 2L, 2.5),
      // key "b": one obs exactly ON a multiple -> a single self-filled point
      ("b", 30L, 3L, 3.5),
      // key "c": span (11..14) contains no multiple of 10 -> no rows
      ("c", 11L, 4L, 4.5), ("c", 14L, 5L, 4.6),
      // key "d": same-instant tie at t=10 -> keep-first by event id
      ("d", 10L, 7L, 7.5), ("d", 10L, 6L, 6.5))
      .toDF("k", "ts_us", "eid", "v")
    val got = operators.Ops.resampleForward(obs, Seq("k"), "ts_us", Seq("v"), "eid", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("a", 10L, 1.5), ("a", 20L, 1.5),
      ("b", 30L, 3.5),
      ("d", 10L, 6.5)))
    intercept[IllegalArgumentException] {
      operators.Ops.resampleForward(obs, Seq("k"), "ts_us", Seq("v"), "eid", 0L)
    }
  }

  test("resampleForward: pre-epoch timestamps use floor-division grid alignment") {
    // mn=-15, step=10: the first multiple ≥ -15 is -10; truncating DIV
    // would have produced 0 and silently dropped the -10 grid point
    val obs = Seq(("a", -15L, 1L, 1.5), ("a", 12L, 2L, 2.5))
      .toDF("k", "ts_us", "eid", "v")
    val got = operators.Ops.resampleForward(obs, Seq("k"), "ts_us", Seq("v"), "eid", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", -10L, 1.5), ("a", 0L, 1.5), ("a", 10L, 1.5)))
  }

  test("resampleForward: maxStepsPerKey guard raises instead of exploding one key") {
    // one key spanning 1000 steps with a cap of 100: the guard must fire
    // executor-side with the actual grid size, not OOM the task
    val obs = Seq(("a", 0L, 1L, 1.5), ("a", 10000L, 2L, 2.5))
      .toDF("k", "ts_us", "eid", "v")
    val ex = intercept[Exception] {
      operators.Ops.resampleForward(
        obs, Seq("k"), "ts_us", Seq("v"), "eid", 10L, maxStepsPerKey = 100)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxStepsPerKey"), s"unexpected error: $ex")
    // at the default cap the same frame is fine
    assert(operators.Ops.resampleForward(
      obs, Seq("k"), "ts_us", Seq("v"), "eid", 10L).count() == 1001L)
  }
}
