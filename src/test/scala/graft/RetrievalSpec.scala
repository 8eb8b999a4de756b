package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 + reciprocal-rank fusion behavior: ranking order, idf weighting,
  * absent-term/absent-doc edges, and the broadcast shape of the
  * postings-side semi-join.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark join"),        // high tf on 'spark'
    (2L, "spark join join window"),        // balanced
    (3L, "window order order order"),      // no query terms for q0
    (4L, "spark"),                         // short doc: length norm boosts it
    (5L, "the quick brown fox")).toDF("doc_id", "text")

  test("bm25TopK ranks term-bearing docs and never returns term-free ones") {
    val q = Seq((0L, "spark join")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10)
      .orderBy($"rank").collect()
    val ids = out.map(_.getLong(1)).toSeq
    assert(ids.toSet == Set(1L, 2L, 4L), "only docs containing a query term score")
    // rank is dense 1..n and scores are strictly ordered under the tiebreak
    assert(out.map(_.getLong(2)).toSeq == (1L to ids.size).toSeq)
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
    // doc 2 leads: two hits on 'join', the rarer (higher-idf) term
    assert(ids.head == 2L)
  }

  test("bm25TopK idf: a rarer term outweighs a commoner one at equal tf/dl") {
    val docs = Seq(
      (1L, "alpha filler filler"), // 'alpha' appears in 3 docs
      (2L, "alpha filler filler"),
      (3L, "alpha filler filler"),
      (4L, "rare filler filler") // 'rare' appears in 1 doc
    ).toDF("doc_id", "text")
    val q = Seq((0L, "alpha rare")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(4L) > out(1L), "df=1 term must score above df=3 term")
  }

  test("bm25TopK with no matching terms is empty, not an error") {
    val q = Seq((0L, "zzz qqq")).toDF("query_id", "qtext")
    assert(Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 5).count() == 0)
  }

  test("bm25TopK on an empty corpus returns empty with the contract schema") {
    val q = Seq((0L, "spark join")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus.limit(0), "doc_id", "text", q, k = 5)
    // sum(dl) is NULL and avgdl is 0/0 on an empty corpus — the guard must
    // return no matches, not throw
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(out.count() == 0L)
  }

  test("bm25TopK caps at k per query and serves multiple queries in one pass") {
    val q = Seq((0L, "spark"), (1L, "order")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.count(_._1 == 0L) == 2, "q0 has 3 matches, capped at 2")
    assert(out.count(_._1 == 1L) == 1, "q1 has a single matching doc")
  }

  test("bm25TopK broadcasts the query-term dictionary onto the postings") {
    val q = Seq((0L, "spark join")).toDF("query_id", "qtext")
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "query-side inputs must broadcast, never shuffle the corpus for them")
  }

  test("rrfFuse: both-lists docs sum both terms, single-list docs get one") {
    val a = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "rank")
    val b = Seq((10L, 3L), (12L, 1L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(out(10L) - (1.0 / 61 + 1.0 / 63)) < 1e-15)
    assert(math.abs(out(11L) - 1.0 / 62) < 1e-15)
    assert(math.abs(out(12L) - 1.0 / 61) < 1e-15)
  }
}
