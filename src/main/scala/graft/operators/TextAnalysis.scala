package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, quality
  * scoring, language ID, fingerprinting. All pure Column algebra (no UDFs) —
  * at 100 TB these run embarrassingly parallel inside the scan stage with
  * zero shuffle, and Catalyst prunes the parquet read to just `text`.
  */
object TextAnalysis {

  /** Lowercased word tokens: maximal `[a-z0-9]` runs via
    * `regexp_extract_all` — semantically identical to splitting on
    * `[^a-z0-9]+` and dropping empties, but a single codegen'd expression;
    * the split+filter formulation is a higher-order function
    * (CodegenFallback), which broke the whole-stage-codegen span of every
    * downstream text operator.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** PII patterns the scrubber redacts, in application order. Deliberately
    * RE2-safe syntax (char classes, bounded repeats, `\b` — no lookaround,
    * no backreferences) so the same pattern string runs identically under
    * Java regex (Spark) and RE2 (DuckDB, the oracle): leftmost match +
    * greedy quantifiers agree between the two engines on this subset.
    * Order matters and is part of the contract: emails first (their local
    * part could otherwise be half-eaten by a digit rule), then IPs, then
    * SSN-shaped, then US-phone-shaped (3-2-4 and 3-3-4 grouping cannot
    * overlap, but both contain digit runs an earlier rule must not split).
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b")

  /** Keyed pseudonymization — the companion to [[piiScrub]] for STRUCTURED
    * identifiers: each value in `cols` is replaced by a stable token,
    * `md5(value || salt)` truncated to 16 hex chars. Same value + same salt
    * ⇒ same token (joins and group-bys on the pseudonym still work, the
    * property anonymized analytics needs); different salt ⇒ unlinkable
    * tokens, so per-release salts prevent cross-dataset joins. NULLs stay
    * NULL. One scan-stage projection, zero shuffles; md5 (not xxhash) so
    * any SQL engine can replay or re-derive the mapping given the salt.
    * This is pseudonymization, not anonymization — whoever holds the salt
    * can rebuild the mapping by hashing candidate values.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(salt.nonEmpty, "an empty salt makes tokens trivially re-derivable")
    df.withColumns(cols.map { c =>
      c -> substring(md5(concat(col(c).cast("string"), lit(salt))), 1, 16)
    }.toMap)
  }

  /** PII scrubbing — the redaction pass every shareable training corpus
    * runs: per-type occurrence counts (on the ORIGINAL text) plus the text
    * with every match replaced by `replacement`, applied per [[piiPatterns]]
    * order. Pure Column algebra over codegen'd `regexp_count` /
    * `regexp_replace` — one scan stage, zero shuffle, zero UDFs; at 100 TB
    * the scrub rides the same pass as any other per-document gate, and the
    * per-type counts aggregate into the corpus PII census for free.
    */
  def piiScrub(
      df: DataFrame,
      textCol: String,
      replacement: String = "[PII]"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"pii_$name")
    }
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat)) =>
      regexp_replace(c, lit(pat), lit(replacement))
    }
    df.withColumns(
      (piiPatterns.map { case (name, _) => s"pii_$name" } :+ textCol)
        .zip(counts :+ scrubbed).toMap)
  }

  /** BPE-ish subword count estimate: word tokens plus an extra token per 4
    * chars of long words (the usual "~4 chars/token" heuristic), computed
    * without any model — deterministic and cheap.
    */
  def subwordEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + greatest(lit(1L), ceil(length(t) / 4.0).cast("long")))

  private val stopwordList: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "it", "this", "that")

  /** Quality-scoring feature columns (length / punctuation / stopword
    * ratios). Returned as a struct so one `withColumn` materializes all
    * features; the struct keeps codegen in a single projection.
    */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChars = length(text)
    val nPunct = length(regexp_replace(text, "[^.!?,;:]", ""))
    // native set-membership count: the filter(t -> t.isin(...)) HOF is
    // CodegenFallback and broke the codegen span of the whole projection
    val nStop = graft.functions.HashExpressions.countInSet(toks, stopwordList)
    struct(
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      when(nTok > 0, (nChars.cast("double") / nTok)).otherwise(lit(0.0)).as("avg_token_len"),
      when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0.0)).as("punct_ratio"),
      when(nTok > 0, nStop.cast("double") / nTok).otherwise(lit(0.0)).as("stopword_ratio"))
  }

  /** Language-ID heuristic: per-language marker-token profiles scored by hit
    * count over the document's token set; argmax wins, ties broken by fixed
    * language order, zero hits -> "und". Profiles are tiny driver-side
    * literals (broadcast as constants into codegen).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una", "sono", "non"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scores: Seq[(String, Column)] = langProfiles.map { case (lang, markers) =>
      lang -> graft.functions.HashExpressions.countInSet(toks, markers)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Document fingerprint: a 64-bit polynomial rolling hash over the token
    * sequence (order-sensitive, whitespace-insensitive) — two documents with
    * the same token stream collide regardless of formatting. The fold is a
    * native expression ([[graft.functions.HashExpressions.RollingHash]]):
    * wraparound multiply is intentional, which rules out SQL `*` under ANSI.
    */
  def fingerprint(text: Column): Column =
    graft.functions.HashExpressions.rollingHash(transform(tokens(text), t => xxhash64(t)))

  /** Character shingles of length k (for MinHash). */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(text)
    when(length(t) < k, array(t)).otherwise(
      transform(sequence(lit(0), length(t) - k), i => t.substr(i + 1, lit(k))))
  }

  /** Word n-gram shingles (for MinHash / n-gram Jaccard / frequency mining).
    * Native single-pass kernel ([[graft.functions.HashExpressions.NGramStrings]]):
    * the `transform(sequence, i -> concat_ws(slice(toks, ...)))` formulation
    * copies the token array per shingle inside an interpreted lambda —
    * measured ~10x slower at bench scale.
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.HashExpressions.ngramStrings(tokens(text), n)

  /** Overlapping token-window chunks (`size` tokens, stride `stride`) —
    * context-bounded training samples; same native kernel as shingles.
    */
  def tokenChunks(tokens: Column, size: Int, stride: Int): Column =
    graft.functions.HashExpressions.ngramStrings(tokens, size, stride)

  /** Per-document top-k terms by tf×idf, with LINEAR idf (tf·N/df): same
    * ranking as the log form for the per-doc top-k but transcendental-free —
    * ln() can differ by an ulp between the JVM and DuckDB's libm, which
    * would break the exact hash gate. All math is integer-exact in double.
    *
    * `minDf` is the scale knob: the Zipf tail means hapax-ish terms dominate
    * the distinct-token space, so dropping `df < minDf` terms before the
    * tf⋈df join cuts the join output and the per-doc window shuffle by the
    * tail mass (spec-asserted via shuffle-write metrics). The default 1 keeps
    * the exact-oracle semantics; corpus-scale runs want 2+.
    */
  /** Repetition-based quality signal (the Gopher-rule family): the fraction
    * of duplicate word n-grams in a document. Boilerplate, keyword stuffing
    * and generation loops all show up as high duplicate-trigram mass, which
    * length/stopword ratios miss entirely. Pure Column algebra over the
    * native shingle kernel — runs inside the scan stage, zero shuffle, and
    * the integer-count → one-divide math keeps it exactly DuckDB-mirrorable.
    */
  def repetitionStats(text: Column, n: Int = 3): Column = {
    // the shingle kernel emits one whole-doc window for docs shorter than n
    // (the right call for DEDUP — short docs still need a signature); for a
    // repetition STATISTIC a sub-n doc has no n-grams, so gate on token
    // count (size(null) = -1 also lands in the empty branch)
    val grams = when(size(tokens(text)) >= n, wordShingles(text, n))
      .otherwise(array().cast("array<string>"))
    val total = size(grams)
    val distinctN = size(array_distinct(grams))
    struct(
      total.cast("long").as("n_ngrams"),
      distinctN.cast("long").as("n_distinct"),
      when(total > 0, (total - distinctN).cast("double") / total)
        .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** The other Gopher repetition rule: the share of a document's n-grams
    * taken by its single most frequent n-gram — catches documents that loop
    * ONE phrase hard enough to dominate, which the duplicate-fraction metric
    * under-weights when the rest of the doc is clean. Distribution-shaped
    * (explode → two aggregations keyed by doc_id, map-side partials absorb
    * the explode); docs with fewer than n tokens emit no row.
    */
  def topNgramShare(docs: DataFrame, n: Int = 3): DataFrame = {
    val grams = when(size(tokens(col("text"))) >= n, wordShingles(col("text"), n))
    docs.select(col("doc_id"), explode(grams).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_ngrams"))
      .select(col("doc_id"),
        col("top_cnt").cast("long").as("top_cnt"),
        col("n_ngrams").cast("long").as("n_ngrams"),
        (col("top_cnt").cast("double") / col("n_ngrams")).as("top_share"))
  }

  /** Benchmark decontamination: for every corpus document, the overlap of
    * its distinct word n-grams with an evaluation set's n-gram vocabulary —
    * the standard pre-training hygiene check (a doc sharing a large shingle
    * mass with a benchmark likely CONTAINS benchmark items and must not be
    * trained on).
    *
    * Scale shape: the eval side is small by construction (benchmarks are),
    * so its distinct shingles broadcast; the corpus side explodes its
    * distinct shingles inside the scan stage, hash-joins against the
    * broadcast, and aggregates per doc — one doc-keyed shuffle, reused by
    * the join-back (co-partitioned). Docs with zero overlap survive with 0.
    */
  def contaminationCheck(docs: DataFrame, evalDocs: DataFrame, n: Int = 3): DataFrame = {
    def gramsOf(df: DataFrame): DataFrame = df.select(col("doc_id"),
      array_distinct(
        when(size(tokens(col("text"))) >= n, wordShingles(col("text"), n))
          .otherwise(array().cast("array<string>"))).as("grams"))
    val d = gramsOf(docs)
    val evalGrams = gramsOf(evalDocs).select(explode(col("grams")).as("g")).distinct()
    val overlaps = d.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    d.join(overlaps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(size(col("grams")) > 0,
          coalesce(col("n_overlap"), lit(0L)).cast("double") / size(col("grams")))
          .otherwise(lit(0.0)).as("overlap_frac"))
  }

  /** The scored (doc, term) candidate set feeding the per-doc ranking:
    * tf ⋈ df on token (+ broadcast corpus size). With `minDf > 1` the df
    * side drops `df < minDf` terms BEFORE the join, so the candidate set —
    * what the top-k ranking has to chew through — shrinks by the Zipf tail
    * mass (hapax terms dominate the distinct-token space AND score highest
    * under idf, so this is also the knob that keeps one-off typos out of
    * the top terms). Exposed separately so callers (and the spec, via
    * `observe`) can see the stage the knob cuts.
    */
  def tfidfCandidates(docs: DataFrame, minDf: Long = 1): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreqAll = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val dfreq = if (minDf > 1L) dfreqAll.filter(col("df") >= minDf) else dfreqAll
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, "token").crossJoin(n)
      .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
  }

  def tfidfTopTerms(docs: DataFrame, k: Int = 3, minDf: Long = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tfidfCandidates(docs, minDf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("score"))
  }

  /** Fixed-point quantum for distributed per-doc double sums: floor(x*2^20)
    * is IEEE-exact (power-of-two scale + floor) and the long sums are
    * order-free — the same trick as [[Similarity.trainCodebook]]; without it
    * a per-doc `sum(double)` depends on shuffle merge order and can never
    * hash-match a sequential oracle.
    */
  private val Fp = 1048576.0

  /** Per-token weight of the hashed linear classifier: the token's md5 maps
    * it to a deterministic weight in [-1, 1] (md5 is computed identically in
    * any engine, so the "model" is portable by construction). In production
    * the weight table comes from training; the pipeline shape — hashing
    * trick, per-token lookup in the scan stage, distribution-shaped margin
    * aggregation — is exactly what a trained model uses.
    */
  private def hashedWeight(tok: Column): Column =
    (conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % 1001L - 500L)
      .cast("double") / 500.0

  /** Model-based quality filtering, fastText-shaped: a linear classifier
    * over hashed token features scores every document; the margin (mean
    * token weight + bias) gates the corpus. ENTIRELY scan-stage: the weight
    * lookup is pure Column algebra (one md5 + arithmetic per token — no
    * dictionary join, the point of the hashing trick) and the per-doc sum
    * is an `aggregate` fold over the token array — no explode, no shuffle,
    * no re-join for empty docs. A model gate that moves zero bytes is the
    * only shape that stays free at 100 TB. The fold accumulates fixed-point
    * longs left-to-right, so the margin is bitwise deterministic at any
    * parallelism (and equals the old groupBy-sum form exactly: integer
    * addition is associative).
    *
    * Returns (doc_id, n_tokens, margin, pass) for every input document —
    * callers filter on `pass` (or re-threshold on `margin`).
    */
  def classifierScore(docs: DataFrame, bias: Double = 0.0, threshold: Double = 0.0): DataFrame = {
    val toks = coalesce(tokens(col("text")), array().cast("array<string>"))
    val qsum = aggregate(
      transform(toks, t => floor(hashedWeight(t) * lit(Fp)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val n = size(toks).cast("long")
    val margin = when(n > 0,
      (qsum.cast("double") / n) / lit(Fp) + lit(bias)).otherwise(lit(bias))
    docs.select(col("doc_id"),
      n.as("n_tokens"),
      margin.as("margin"),
      when(margin > threshold, 1L).otherwise(0L).as("pass"))
  }

  /** Corpus-bigram language-model scoring (the KenLM-filter stand-in): train
    * bigram conditional probabilities p(w2|w1) = C(w1 w2) / C(w1·) on the
    * corpus itself, then score each document by its MEAN bigram probability.
    * Generated/boilerplate text scores high, token soup scores low. The mean
    * (not the log-likelihood product) keeps every number rational — exact
    * integer counts, one divide — so the oracle hash-matches; a log-space
    * variant would differ by ulps between libms.
    *
    * Scale shape: bigrams explode inside the scan stage, ONE occurrence
    * count keyed by bigram; the prefix marginal C(w1·) then re-aggregates
    * the DISTINCT-bigram table (vocabulary-sized, not corpus-sized — the
    * sum of C(w1 w2) over w2 IS C(w1·)), and the two attach into one
    * bigram→probability model before the single occurrence-to-model scoring
    * join (AQE-handled equi-shuffles — the model never visits the driver).
    * The old form aggregated the full corpus explode twice and joined it
    * twice; this halves the corpus-sized shuffles with the identical
    * rational result.
    */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val grams = when(size(tokens(col("text"))) >= 2, wordShingles(col("text"), 2))
      .otherwise(array().cast("array<string>"))
    val bg = docs.select(col("doc_id"), explode(grams).as("g"))
    val c2 = bg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(split_part(col("g"), lit(" "), lit(1)).as("w"))
      .agg(sum(col("c2")).as("c1"))
    val model = c2
      .join(c1, split_part(col("g"), lit(" "), lit(1)) === col("w"))
      .select(col("g"),
        floor((col("c2").cast("double") / col("c1")) * lit(Fp)).cast("long").as("q"))
    val scored = bg
      .join(model, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("qs"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          (col("qs").cast("double") / col("n_bigrams")) / lit(Fp))
          .otherwise(lit(0.0)).as("avg_bigram_p"))
  }

  /** Hash-bucket index of a token for the trained classifier's feature
    * space: the same portable md5 construction as [[hashedWeight]] (first 8
    * hex chars parse to the same BIGINT in any engine), folded onto
    * `buckets` features. Shared by training and scoring so a weight table
    * learned anywhere scores identically everywhere.
    */
  def hashBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** Per-(doc, label, bucket) token-count features — the shared input
    * relation of [[trainPerceptron]] and [[scoreWithWeights]]. One
    * corpus-sized shuffle (map-side combined); everything downstream of it
    * is model-sized.
    */
  private def features(
      docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("__d"),
        (label.cast("int") * 2 - 1).cast("long").as("__y"),
        explode(tokens(col(textCol))).as("__tok"))
      .select(col("__d"), col("__y"), hashBucket(col("__tok"), buckets).as("__b"))
      .groupBy(col("__d"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__x"))

  /** Distributed training of the quality/language classifier (the fastText
    * recipe's seed-set stage, which [[classifierScore]]'s fixed hashed
    * weights stand in for): batch perceptron over hashed token-count
    * features. `label` is the boolean seed signal (true → +1, false → −1).
    *
    * Determinism is the design driver, the same construction as
    * [[graft.operators.Graph.FixedPoint]] taken one step further: weights
    * are INTEGERS (token counts summed with ±1 labels), margins are exact
    * integer dot products, and the per-iteration update is batch-synchronous
    * — w += Σ over currently-misclassified examples of y·x. No floats
    * anywhere, so the learned table is bitwise identical at any parallelism
    * and an oracle can replay every iteration in SQL. (True SGD is
    * inherently order-dependent — a sequential visit order cannot be
    * mirrored by an order-free distributed sum, so the batch variant is the
    * correct distributed restatement, not a simplification.)
    *
    * Scale shape: the feature relation is built by ONE corpus-sized shuffle
    * and checkpointed (every iteration scans it; see the
    * [[graft.Checkpointing]] note on iterative consumers). Each iteration is
    * then: broadcast the weight table (≤ `buckets` rows) into the margin
    * scan, one doc-keyed aggregation for margins, one bucket-keyed
    * aggregation for the gradient — shuffle volume is features-sized, never
    * pairs, and nothing reaches the driver.
    *
    * Returns (bucket, weight) for every bucket with a nonzero final weight.
    */
  def trainPerceptron(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      buckets: Int = 1024,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    require(buckets > 0, "buckets must be positive")
    val feats = features(docs, idCol, textCol, label, buckets)
      .transform(graft.Checkpointing.materialize)
    // iteration 1 from w = 0 in closed form: every margin is 0, 0 is a
    // perceptron miss for either label, so w1 is the full label-weighted
    // feature sum — saves the first (trivial) margin pass
    var w = feats.groupBy(col("__b"))
      .agg(sum(col("__y") * col("__x")).as("__w"))
      .transform(graft.Checkpointing.materialize)
    for (_ <- 2 to iters) {
      val mis = feats
        .join(broadcast(w), Seq("__b"), "left")
        .groupBy(col("__d"), col("__y"))
        .agg(sum(coalesce(col("__w"), lit(0L)) * col("__x")).as("__m"))
        .filter(col("__y") * col("__m") <= 0)
        .select(col("__d"))
      val grad = feats.join(mis, Seq("__d"), "left_semi")
        .groupBy(col("__b")).agg(sum(col("__y") * col("__x")).as("__g"))
      w = w.join(grad, Seq("__b"), "full_outer")
        .select(col("__b"),
          (coalesce(col("__w"), lit(0L)) + coalesce(col("__g"), lit(0L))).as("__w"))
        .transform(graft.Checkpointing.materialize)
    }
    w.filter(col("__w") =!= 0L)
      .select(col("__b").as("bucket"), col("__w").as("weight"))
  }

  /** Score documents with a TRAINED weight table ([[trainPerceptron]]'s
    * output): exact integer dot product of the doc's hashed token counts
    * against the broadcast weights, plus the predicted label. The trained
    * counterpart of [[classifierScore]]'s fixed-weight margin — same plan
    * shape (scan-stage feature hash, one doc-keyed shuffle), weights joined
    * by bucket instead of derived from md5.
    *
    * Returns (doc_id, score, predicted) for every input document (empty and
    * all-unseen-bucket docs score 0 → predicted −1 on the > 0 rule).
    */
  def scoreWithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 1024): DataFrame = {
    // the weight table is bounded by the bucket count (the hashing trick's
    // whole point), so it collects to a driver-side lookup array and
    // inference becomes a PURE scan-stage fold over each doc's token array:
    // no explode, no per-doc shuffle, no join — the same zero-byte-movement
    // shape as [[classifierScore]], with the learned weights riding the
    // closure. Long sums keep the score exact under any token order.
    val w = new Array[Long](buckets)
    weights.select(col("bucket"), col("weight")).collect().foreach { r =>
      val b = r.getLong(0).toInt
      if (b >= 0 && b < buckets) w(b) = r.getLong(1)
    }
    val wLit = typedlit(w.toSeq)
    val toks = coalesce(tokens(col(textCol)), array().cast("array<string>"))
    val score = aggregate(
      transform(toks, t => element_at(wLit, hashBucket(t, buckets).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    docs.select(col(idCol),
      score.as("score"),
      when(score > 0, 1L).otherwise(-1L).as("predicted"))
  }

  /** Per-document DEFLATE compression ratio — the corpus-quality signal the
    * RedPajama/Gopher-line pipelines gate on: templated/boilerplate text
    * compresses far below natural prose, token soup barely compresses at
    * all. Runs as a partition-batched typed transform (one `Deflater` per
    * partition, reset per row — the [[Multimodal]] pattern, not a row UDF),
    * so at corpus scale it is an embarrassingly parallel scan-stage pass.
    *
    * Returns (id, n_bytes, n_compressed, ratio) with ratio =
    * compressed/raw over UTF-8 bytes; empty/null text reports (0, 0, 1.0).
    * Deterministic for a fixed JVM's zlib at the fixed level; correctness
    * checks are therefore invariant-style (DuckDB ships no deflate).
    */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
        val buf = new Array[Byte](16 * 1024)
        it.map { case (id, text) =>
          val raw =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (raw.isEmpty) (id, 0L, 0L, 1.0)
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var comp = 0L
            while (!deflater.finished()) comp += deflater.deflate(buf)
            (id, raw.length.toLong, comp, comp.toDouble / raw.length)
          }
        }
      }
      .toDF(idCol, "n_bytes", "n_compressed", "ratio")
  }
}
