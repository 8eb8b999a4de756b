package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch text retrieval: BM25 keyword search and reciprocal-rank fusion.
  *
  * The reference ships no search operator; this is part of the
  * training-data-pipeline extension surface (query-aware corpus selection,
  * retrieval-based decontamination, hybrid keyword+vector ranking).
  *
  * Scale shape (the 100 TB contract):
  *   - The full-corpus work is exactly two scan-stage passes: the 1-row
  *     stats aggregate (N, avgdl) and tokenize + explode, which carries
  *     each doc's length alongside its terms. The very next step
  *     semi-joins the postings to a BROADCAST query-term dictionary, so
  *     every aggregation (tf, df, score-sum) and every join runs on the
  *     matched slice — |query terms| × avg postings list, not the corpus.
  *   - Corpus-level constants (N, avgdl) come from one 1-row aggregate of
  *     the doc-length projection; they travel into the score expression as
  *     literals, not a join.
  *   - Top-k per query is a window row_number over the per-(query, doc)
  *     scores — matched-slice-sized, never corpus-sized.
  *
  * Scoring is BM25 with the log-free rational idf
  * `(N - df + 0.5) / (df + 0.5)` (the argument of Lucene's
  * `ln(1 + ·)`). Division is IEEE-exact, so scores are bit-identical
  * between this engine and the DuckDB oracle; `ln` is NOT (measured: Java
  * `Math.log` and DuckDB `ln` disagree by 1 ulp on ~1/6500 of the idf
  * arguments at these corpus sizes). The rational form preserves the
  * per-term df ordering exactly and keeps the whole score inside the
  * bitwise-deterministic subset (+ - * / on doubles in a fixed shape).
  */
object Retrieval {

  /** Per-(query, doc) BM25 top-k.
    *
    * @param docs    corpus with `idCol` (long) and `textCol` (string)
    * @param queries query set with `query_id` and `qtext` columns; expected
    *                SMALL (it is collected into a broadcast dictionary)
    * @return `(query_id, doc_id, rank, score)`, `rank` 1-based within each
    *         query by (score desc, doc_id asc), `rank <= k`
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val lens = toks.select(col("doc_id"), size(col("toks")).as("dl"))

    // one 1-row aggregate for the corpus constants; the driver-side head()
    // is 16 bytes, not a collect of data
    val statsRow = lens.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl")).head()
    val nDocs = statsRow.getLong(0)
    // empty corpus: sum(dl) aggregates to NULL (getLong would NPE) and
    // avgdl would divide by zero — the correct answer is simply no matches
    if (nDocs == 0L)
      return queries.select(col("query_id")).limit(0)
        .withColumn("doc_id", lit(null).cast(docs.schema(idCol).dataType))
        .withColumn("rank", lit(null).cast("long"))
        .withColumn("score", lit(null).cast("double"))
    val avgdl = statsRow.getLong(1).toDouble / nDocs

    // (query_id, term) pairs and the distinct term dictionary — both tiny,
    // both broadcast; the dictionary semi-restricts the corpus postings
    // BEFORE any shuffle so df/tf aggregate over the matched slice only
    val qterms = queries.select(
        col("query_id"),
        explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    val qdict = qterms.select(col("term")).distinct()

    // dl rides the explode projection (constant per doc, first() under the
    // per-(doc, term) grouping), so the matched slice carries its own
    // lengths — no corpus-sized lens join, no second tokenize subtree
    val postings = toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(qdict), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

    scoreAndRank(postings, qterms, nDocs, avgdl, k, k1, b)
  }

  /** The BM25 scoring tail shared by the ad-hoc two-pass form
    * ([[bm25TopK]]) and the persisted-index form
    * ([[graft.streaming.Bm25Index]]): identical Column shapes, so the two
    * paths produce BITWISE-equal scores from the same `(term, doc_id, tf,
    * dl)` postings slice and corpus constants.
    *
    * @param postings matched-slice postings, unique on (doc_id, term)
    * @param qterms   distinct (query_id, term) pairs — tiny, broadcast
    */
  private[graft] def scoreAndRank(
      postings: DataFrame, qterms: DataFrame, nDocs: Long, avgdl: Double,
      k: Int, k1: Double, b: Double): DataFrame = {
    // df per matched term: postings are unique on (doc, term) so a count
    // is the document frequency; the result is |matched terms| rows —
    // broadcast it back onto the postings
    val dfs = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // n_docs and avgdl enter the score as literals (no corpus-stats join)
    val scoredLit = postings
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .select(
        col("query_id"), col("doc_id"), col("term"),
        ((((lit(nDocs) - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) +
                lit(b) * (col("dl").cast("double") / lit(avgdl))))))
          .as("s"))

    // deterministic per-(query, doc) sum: collect the term scores, sort by
    // term, fold sequentially — the same order the DuckDB oracle's
    // list_sum(list(s ORDER BY term)) uses, so the double sum is bitwise
    // reproducible (see Scaladoc)
    val summed = scoredLit
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("s")))).as("ts"))
      .select(
        col("query_id"), col("doc_id"),
        aggregate(col("ts"), lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    summed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Reciprocal-rank fusion of two ranked lists for the same query:
    * `rrf = 1/(c + rank_a) + 1/(c + rank_b)` with an absent rank
    * contributing 0. Ranks are small integers, so each term is one exact
    * IEEE division and the fused score is bitwise deterministic.
    *
    * Inputs are (doc_id, rank) top-k lists — k-sized, so the outer join is
    * a driver-trivial broadcast at any corpus scale.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int = 60): DataFrame = {
    val ra = a.select(col("doc_id"), col("rank").as("rank_a"))
    val rb = b.select(col("doc_id"), col("rank").as("rank_b"))
    ra.join(rb, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_a").cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_b").cast("double")),
            lit(0.0))).as("rrf"))
  }
}
