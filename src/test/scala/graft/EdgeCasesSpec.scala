package graft

import graft.operators.{Dedup, Joins, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: empty frames, null/empty text, k larger than
  * the corpus. At 100 TB a pipeline WILL see empty partitions, null payloads
  * and undersized groups; operators must pass them through, not throw.
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup family is an identity on empty input") {
    assert(Dedup.exact(emptyDocs, "doc_id", Seq("text")).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("dedup family passes null and empty text through without throwing") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "real text here"),
      (4L, "real text here")).toDF("doc_id", "text")
    // null/empty docs produce no LSH candidates, so they all survive;
    // the genuine duplicate pair still collapses to the smaller id
    val kept = Dedup.minhashLsh(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(3L) && !kept.contains(4L))
    assert(Dedup.simhash(docs, "doc_id", "text").count() >= 3)
    assert(Dedup.exact(docs, "doc_id", Seq("text")).count() == 3)
  }

  test("text analysis yields empty/zero features on null and empty text") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        TextAnalysis.qualityFeatures(col("text")).getField("n_tokens").as("n"),
        TextAnalysis.langId(col("text")).as("lang"))
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1) || rows(0).getInt(1) == 0) // null text
    assert(rows(1).getInt(1) == 0 && rows(1).getString(2) == "und")
    assert(rows(2).getInt(1) == 2)
  }

  test("asOfJoin with an empty right side is empty (inner as-of)") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "ts")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "ts", "payload")
    val out = Joins.asOfJoin(left, right, Seq("k"), "ts", "ts",
      rightPayload = Seq("payload"), rightTieBreak = "payload")
    assert(out.count() == 0)
  }

  test("timeRangeJoin with empty sides is empty, not an error") {
    val l = Seq.empty[(Long, java.sql.Timestamp)].toDF("k", "a_ts")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k", "b_ts")
    assert(Joins.timeRangeJoin(l, r, Seq("k"), "a_ts", "b_ts", 0L, 1000000L).count() == 0)
    assert(Joins.timeRangeJoin(r.toDF("k", "a_ts"), l.toDF("k", "b_ts"),
      Seq("k"), "a_ts", "b_ts", 0L, 1000000L).count() == 0)
  }

  test("top-k with k exceeding the corpus returns the whole corpus, ranked") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count().toInt
    val q = emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k = n + 100).collect()
    assert(top.length == n)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
