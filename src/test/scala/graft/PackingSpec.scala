package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packGreedy(
      rows.toDF("lang", "doc_id", "n_tokens"), "lang", "doc_id",
      col("n_tokens"), budget)
      .select(col("group"), col("id"), col("bin_id"))
      .as[(String, Long, Long)].collect().map { case (g, i, b) => (g, i) -> b }.toMap

  test("greedy sequential fill opens a bin exactly when the next doc does not fit") {
    val rows = Seq(
      ("g", 1L, 100L), ("g", 2L, 100L), // bin 0: 200/256
      ("g", 3L, 100L), ("g", 4L, 60L),  // 300 > 256 -> bin 1: 160/256
      ("g", 5L, 250L),                  // bin 2
      ("g", 6L, 300L))                  // oversized doc gets its own bin 3
    val bins = pack(rows, budget = 256L)
    assert(bins == Map(
      ("g", 1L) -> 0L, ("g", 2L) -> 0L,
      ("g", 3L) -> 1L, ("g", 4L) -> 1L,
      ("g", 5L) -> 2L, ("g", 6L) -> 3L))
  }

  test("groups pack independently even when co-located in one partition") {
    val rows = Seq(
      ("a", 1L, 200L), ("a", 2L, 200L), // a: bins 0, 1
      ("b", 1L, 200L), ("b", 2L, 50L))  // b resets: bins 0, 0
    val bins = pack(rows, budget = 256L)
    assert(bins == Map(
      ("a", 1L) -> 0L, ("a", 2L) -> 1L,
      ("b", 1L) -> 0L, ("b", 2L) -> 0L))
  }

  test("assignments are identical at any input partitioning") {
    val rows = (1L to 200L).map(i => (s"g${i % 5}", i, 20L + (i * 13) % 97))
    val df1 = rows.toDF("lang", "doc_id", "n_tokens").repartition(1)
    val df13 = rows.toDF("lang", "doc_id", "n_tokens").repartition(13)
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "lang", "doc_id", col("n_tokens"), budget = 256L)
        .select(col("group"), col("id"), col("n_tokens"), col("bin_id"))
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(run(df1) == run(df13))
  }

  test("packing invariants: capacity respected, bins contiguous and order-monotone") {
    val rows = (1L to 300L).map(i => (s"g${i % 3}", i, 10L + (i * 7) % 120))
    val out = Packing.packGreedy(
      rows.toDF("lang", "doc_id", "n_tokens"), "lang", "doc_id",
      col("n_tokens"), budget = 200L)
      .select(col("group"), col("id"), col("n_tokens"), col("bin_id"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val byGroup = out.groupBy(_._1)
    byGroup.foreach { case (g, rs) =>
      // a multi-doc bin never exceeds the budget (a single oversized doc may)
      rs.groupBy(_._4).foreach { case (bin, docs) =>
        val tot = docs.map(_._3).sum
        assert(docs.size == 1 || tot <= 200L, s"group $g bin $bin overflows: $tot")
      }
      // bin ids start at 0, are contiguous, and never decrease with id order
      val inOrder = rs.sortBy(_._2).map(_._4)
      assert(inOrder.head == 0L)
      inOrder.sliding(2).foreach { w =>
        if (w.size == 2) assert(w(1) == w(0) || w(1) == w(0) + 1)
      }
    }
  }

  test("binStats reports per-bin totals and fill fraction") {
    val assignments = Packing.packGreedy(
      Seq(("g", 1L, 100L), ("g", 2L, 100L), ("g", 3L, 100L))
        .toDF("lang", "doc_id", "n_tokens"),
      "lang", "doc_id", col("n_tokens"), budget = 256L)
    val stats = Packing.binStats(assignments, budget = 256L)
      .orderBy("bin_id")
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"), col("fill_frac"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(stats == Seq((0L, 2L, 200L, 200.0 / 256.0), (1L, 1L, 100L, 100.0 / 256.0)))
  }
}
