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

  test("incremental pair maintenance matches a full per-step recount exactly") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val steps = 25
    val incremental = Bpe.learnMerges(docs, "text", steps)
      .collect().map(_.toSeq).toSeq
    // brute-force reference: re-explode the FULL vocab every step (the
    // pre-round-8 algorithm) — the delta-maintained table must be
    // bit-identical, merge order and counts included
    var vocab = docs
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .select(col("__c"), regexp_replace(col("__w"), "(.)", "($1)").as("__form"))
      .localCheckpoint(true)
    val reference = Seq.newBuilder[Seq[Any]]
    for (step <- 1 to steps) {
      val best = vocab
        .select(col("__c"), explode(Bpe.pairsOf(col("__form"))).as("__pair"))
        .groupBy(col("__pair")).agg(sum(col("__c")).as("__cnt"))
        .orderBy(col("__cnt").desc, col("__pair").asc).limit(1).collect()
      assert(best.nonEmpty, "fixture must sustain all reference steps")
      val Array(a, b) = best(0).getString(0).split(" ", 2)
      reference += Seq(step, best(0).getString(0), best(0).getLong(1))
      vocab = vocab.withColumn("__form",
        call_function("replace", col("__form"), lit(s"($a)($b)"), lit(s"($a$b)")))
        .localCheckpoint(true)
    }
    assert(incremental == reference.result(),
      "delta-maintained pair counts diverged from the full recount")
  }

  test("the per-step delta scans only the affected vocab subset") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
    // a parquet-backed vocab: ConvertToLocalRelation would otherwise
    // evaluate the affected-filter at optimization time and erase the plan
    // shape this test pins
    val dir = java.nio.file.Files.createTempDirectory("bpe_delta_").toString
    Seq((10L, "(a)(b)(c)"), (5L, "(a)(b)"), (7L, "(x)(y)(z)"), (3L, "(q)"))
      .toDF("__c", "__form").write.mode("overwrite").parquet(dir)
    val vocab = spark.read.parquet(dir)
    val (delta, fused) = Bpe.fuseDelta(vocab, "a", "b")
    // plan shape: every explode in the delta sits ABOVE a contains-filter,
    // so the re-count's input is the affected subset, never the whole vocab
    val generates = delta.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(generates.nonEmpty)
    generates.foreach { g =>
      val filtered = g.collectFirst {
        case f: Filter if f.condition.toString.toLowerCase.contains("contains") => f }
      assert(filtered.nonEmpty,
        s"delta explode is not gated by the affected-subset filter:\n$g")
    }
    // semantics: signed multiset of ONLY the affected words' pair changes
    val out = delta.groupBy(col("__pair")).agg(sum(col("__cnt")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a b" -> -15L, "b c" -> -10L, "ab c" -> 10L),
      s"unexpected delta: $out")
    val forms = fused.select(col("__form")).collect().map(_.getString(0)).toSet
    assert(forms == Set("(ab)(c)", "(ab)", "(x)(y)(z)", "(q)"))
  }
}
