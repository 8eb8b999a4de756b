package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def log(rows: (Long, String, Int, Long)*) =
    rows.toDF("k", "status", "ts", "tie")

  private def hist(rows: (Long, String, Int, Long)*) =
    Scd.scd2FromChangeLog(log(rows: _*), Seq("k"), "ts", "tie", Seq("status"))

  test("scd2FromChangeLog collapses no-change rows and closes intervals") {
    val out = hist(
      (1L, "A", 1, 10L), (1L, "A", 2, 11L), // re-observation: no new version
      (1L, "B", 3, 12L), (1L, "A", 5, 13L),
      (2L, "X", 1, 14L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getLong(4))).toSet
    assert(out == Set(
      (1L, "A", 1, Some(3), 0L),
      (1L, "B", 3, Some(5), 0L),
      (1L, "A", 5, None, 1L),
      (2L, "X", 1, None, 1L)))
  }

  test("same-instant conflicts keep the later observation (zero-length elision)") {
    val out = hist((1L, "A", 1, 10L), (1L, "B", 1, 11L), (1L, "C", 4, 12L))
      .collect().map(r => (r.getString(1), r.getInt(2), Option(r.get(3)))).toSet
    // A opens and closes at t=1 → elided; B wins the instant
    assert(out == Set(("B", 1, Some(4)), ("C", 4, None)))
  }

  test("scd2Merge equals a full rebuild over the combined change log") {
    val base = log(
      (1L, "A", 1, 1L), (1L, "B", 5, 2L),
      (2L, "X", 1, 3L), (3L, "Q", 2, 4L))
    val history = Scd.scd2FromChangeLog(base, Seq("k"), "ts", "tie", Seq("status"))
    // updates: a change for key 1, a no-change for key 2, a late-arriving
    // (out-of-order) change for key 3; key 4 is brand new
    val updates = log(
      (1L, "C", 9, 10L), (2L, "X", 7, 11L), (3L, "P", 1, 12L), (4L, "N", 3, 13L))
    val merged = Scd.scd2Merge(history, updates, Seq("k"), "ts", "tie", Seq("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getLong(4))).toSet
    val rebuilt = Scd.scd2FromChangeLog(
      base.unionByName(updates), Seq("k"), "ts", "tie", Seq("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getLong(4))).toSet
    assert(merged == rebuilt, "merge must be indistinguishable from a rebuild")
    // spot-check the semantics: key 2's no-change update added no version,
    // key 3's late change opened a version BEFORE the existing one
    assert(merged.count(_._1 == 2L) == 1)
    assert(merged.filter(_._1 == 3L) == Set(
      (3L, "P", 1, Some(2), 0L), (3L, "Q", 2, None, 1L)))
    assert(merged.contains((4L, "N", 3, None, 1L)))
  }

  test("a batch update at an existing version's timestamp replaces it") {
    val history = hist((1L, "A", 1, 1L), (1L, "B", 5, 2L))
    val updates = log((1L, "Z", 5, 10L))
    val out = Scd.scd2Merge(history, updates, Seq("k"), "ts", "tie", Seq("status"))
      .collect().map(r => (r.getString(1), r.getInt(2), Option(r.get(3)))).toSet
    assert(out == Set(("A", 1, Some(5)), ("Z", 5, None)),
      "the batch row wins the instant; B is elided")
  }

  test("untouched keys pass through bit-identical") {
    val history = hist((1L, "A", 1, 1L), (2L, "X", 1, 2L), (2L, "Y", 4, 3L))
    val updates = log((1L, "B", 2, 10L))
    val out = Scd.scd2Merge(history, updates, Seq("k"), "ts", "tie", Seq("status"))
    val untouched = out.filter($"k" === 2L).collect().map(_.toSeq).toSet
    val orig = history.filter($"k" === 2L).collect().map(_.toSeq).toSet
    assert(untouched == orig)
  }
}
