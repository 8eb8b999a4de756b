package graft.operators

import graft.Checkpointing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — tokenizer training as a Spark job.
  * Byte-pair encoding (Sennrich et al. 2016, the tokenizer family behind
  * GPT-2/LLaMA vocabularies) learns a merge table by repeatedly fusing the
  * corpus's most frequent adjacent symbol pair; at 100 TB the pair counting
  * is the expensive step and is exactly what Spark distributes well.
  *
  * Symbol-sequence encoding: each word's current segmentation is a single
  * string of bracket-wrapped symbols — "hello" starts as `(h)(e)(l)(l)(o)`.
  * The bracket form is load-bearing: applying merge (a,b) is the literal
  * string replacement `(a)(b)` → `(ab)`, and because adjacent pattern
  * occurrences NEVER share characters (unlike separator-delimited forms,
  * where a boundary char is shared and blocks the second of two adjacent
  * matches), one left-to-right non-overlapping `replace` pass is EXACTLY
  * greedy BPE merge semantics — e.g. `aaaaa` under merge (a,a) becomes
  * `aa·aa·a`, matching reference tokenizers. Every engine's literal
  * `replace` scans leftmost-first non-overlapping, so the construction is
  * both correct and exactly oracle-able; symbols are `[a-z0-9]+` so the
  * brackets can never collide with content.
  *
  * Scale shape: training runs over the DISTINCT-WORD table (vocab-sized —
  * orders of magnitude smaller than the corpus; the corpus is touched once
  * for the word counts). Each step is one map-side-combined aggregation
  * over the vocab (pair explode fused into the scan of the checkpointed
  * vocab), one 1-row driver collect (the argmax — config-sized, the same
  * bounded-collect class as the k-means seeds), and one scan-stage literal
  * replace. The vocab is locally checkpointed each step so step k's job
  * replays nothing — without it, lineage re-derives every prior merge and
  * the loop goes quadratic.
  */
object Bpe {

  /** One learned merge: `step` is 1-based rank order, `pair` the space-
    * joined symbol pair fused at that step, `cnt` its weighted frequency.
    */
  final case class Merge(step: Int, pair: String, cnt: Long)

  private def symbols(form: org.apache.spark.sql.Column) =
    regexp_extract_all(form, lit("\\(([a-z0-9]+)\\)"), lit(1))

  /** Adjacent-pair multiset of a bracket form — one entry PER OCCURRENCE
    * (duplicates included), so summing word counts over the exploded array
    * is the exact weighted pair frequency. Single-symbol words emit no pairs
    * (the kernel's short-input window would emit the lone symbol itself —
    * same guard as wordShingles).
    */
  private[graft] def pairsOf(form: org.apache.spark.sql.Column) = {
    val syms = symbols(form)
    when(size(syms) >= 2, graft.functions.HashExpressions.ngramStrings(syms, 2))
      .otherwise(array().cast("array<string>"))
  }

  /** The incremental step kernel: fusing (a,b) changes the pair multiset of
    * ONLY the words whose form contains the literal `(a)(b)` — the bracket
    * anchors make the containment test exact symbol-boundary matching (the
    * same pattern the replace rewrites). Returns the signed count delta
    * (old pairs of affected words at -count, new pairs at +count) and the
    * fused vocab. The delta's explode scans the affected SUBSET, not the
    * vocab — reference BPE trainers maintain pair counts the same way.
    */
  private[graft] def fuseDelta(
      vocab: DataFrame,
      a: String,
      b: String): (DataFrame, DataFrame) = {
    val pat = s"($a)($b)"
    val fused = call_function("replace", col("__form"), lit(pat), lit(s"($a$b)"))
    val affected = vocab.filter(col("__form").contains(pat))
    val removed = affected
      .select((-col("__c")).as("__cnt"), explode(pairsOf(col("__form"))).as("__pair"))
    val added = affected
      .select(col("__c").as("__cnt"), explode(pairsOf(fused)).as("__pair"))
    val delta = removed.unionByName(added).select(col("__pair"), col("__cnt"))
    // the rewrite itself stays a full-vocab NARROW pass (replace is a no-op
    // off the affected rows; no shuffle) — only the re-COUNT is subset-sized
    (delta, vocab.withColumn("__form", fused))
  }

  /** Learn the first `steps` BPE merges from `docs(textCol)`. Returns the
    * merge table as a DataFrame (step, pair, cnt) — config-sized (`steps`
    * rows), built on the driver from the per-step argmaxes. Ties on count
    * break by ascending pair string, so the table is a deterministic
    * function of the corpus at any parallelism (counts are exact integer
    * sums; no floating point anywhere).
    *
    * The pair census is built ONCE from the initial vocab; every later step
    * maintains it incrementally via [[fuseDelta]] — argmax over the
    * checkpointed pair table, delta re-count over the affected words only,
    * merge + drop of zeroed pairs. 1000 steps cost 1000 affected-subset
    * scans instead of 1000 full-vocab re-explosions, and the table is
    * bit-identical to a full recount (exact integer accounting of the same
    * multiset).
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      steps: Int): DataFrame = {
    require(steps > 0 && steps <= 1000,
      "steps must be in (0, 1000] — the merge table is config-sized by contract")
    val spark = docs.sparkSession
    // corpus pass: distinct words with occurrence counts (ONE corpus-sized
    // shuffle, map-side combined), then the initial char segmentation
    var vocab = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .select(col("__c"), regexp_replace(col("__w"), "(.)", "($1)").as("__form"))
      .transform(Checkpointing.materialize)
    // full census exactly once; checkpointed so step k replays nothing
    var pairCounts = vocab
      .select(col("__c").as("__cnt"), explode(pairsOf(col("__form"))).as("__pair"))
      .groupBy(col("__pair")).agg(sum(col("__cnt")).as("__cnt"))
      .transform(Checkpointing.materialize)
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val best = pairCounts
        .orderBy(col("__cnt").desc, col("__pair").asc)
        .limit(1)
        .collect() // 1 row: the argmax — bounded by construction
      if (best.isEmpty) {
        exhausted = true // every word is a single symbol; nothing left to fuse
      } else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        merges += Merge(step, pair, cnt)
        val Array(a, b) = pair.split(" ", 2)
        val (delta, fusedVocab) = fuseDelta(vocab, a, b)
        vocab = fusedVocab.transform(Checkpointing.materialize)
        pairCounts = pairCounts
          .unionByName(delta)
          .groupBy(col("__pair")).agg(sum(col("__cnt")).as("__cnt"))
          .filter(col("__cnt") > 0) // fused-away pairs zero out and drop
          .transform(Checkpointing.materialize)
        step += 1
      }
    }
    spark.createDataFrame(merges.result())
      .select(col("step"), col("pair"), col("cnt"))
  }

  /** Segment `docs(textCol)` with a learned merge table: replay the merges
    * in step order against each word's char segmentation, then emit one row
    * per document with its subword sequence (space-joined) and subword
    * count — the "tokenize the corpus with the trained tokenizer" half of
    * the BPE lifecycle.
    *
    * Scale shape: the merge table is config-sized, so the replay compiles
    * to a chain of literal `replace` calls inside a `transform` lambda over
    * the token array — zero joins, ZERO shuffles; the whole operator fuses
    * into the document scan, and word order is preserved by construction
    * (an explode + collect_list regroup would not survive a shuffle).
    */
  def segment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= 1000, "the merge table is config-sized by contract")
    val segmentWord = (w: org.apache.spark.sql.Column) => {
      val init = regexp_replace(w, "(.)", "($1)")
      val applied = merges.foldLeft(init) { case (form, (a, b)) =>
        call_function("replace", form, lit(s"($a)($b)"), lit(s"($a$b)"))
      }
      symbols(applied)
    }
    docs
      .select(col(idCol),
        flatten(transform(TextAnalysis.tokens(col(textCol)), segmentWord)).as("__syms"))
      .select(col(idCol),
        concat_ws(" ", col("__syms")).as("subwords"),
        size(col("__syms")).cast("long").as("n_subwords"))
  }
}
