package graft

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("learnMerges replays the textbook banana run and stops when exhausted") {
    val docs = Seq.fill(3)("banana").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", steps = 8)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // per word: pairs ba, an, na, an, na → an:2 na:2 ba:1; ×3 words.
    // tie an/na breaks ascending → "a n"-pair "an" wins; then the chain
    // fuses greedily left-to-right until each word is one symbol and the
    // loop stops EARLY (4 merges, not 8)
    assert(merges == Seq(
      (1, "a n", 6L), (2, "an a", 3L), (3, "an ana", 3L), (4, "b anana", 3L)))
  }

  test("segment applies merges with greedy left-to-right semantics") {
    val docs = Seq((1L, "banana ban")).toDF("doc_id", "text")
    val out = Bpe.segment(docs, "doc_id", "text", Seq(("a", "n"), ("an", "a")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "b an ana b an", 5L)))
  }

  test("repeated-symbol runs merge exactly like reference BPE") {
    // the case that breaks separator-delimited encodings: greedy (a,a) on
    // a^5 is aa·aa·a, and the bracket-form literal replace reproduces it
    val docs = Seq((1L, "aaaa"), (2L, "aaaaa"), (3L, "a")).toDF("doc_id", "text")
    val out = Bpe.segment(docs, "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("aa aa", 2L)))
    assert(out(2L) == (("aa aa a", 3L)))
    assert(out(3L) == (("a", 1L)))
  }

  test("learnMerges is deterministic at any parallelism") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(parts: Int) =
      Bpe.learnMerges(docs.repartition(parts), "text", steps = 4)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(7), "merge table must not depend on partitioning")
  }
}
