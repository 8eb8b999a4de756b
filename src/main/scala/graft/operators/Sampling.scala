package graft.operators

import graft.Checkpointing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing: the operators that turn a
  * curated corpus into a TRAINING MIX — domain-weighted subsampling,
  * fractional-epoch upsampling, per-stratum caps, token-budget selection,
  * quantile-gated quality filtering, and a reproducible global shuffle
  * order. The reference's pipeline stops at load (services/pipelines/
  * etl_pipeline.py:24-38 runs extract→transform→load with no sampling
  * stage); these extend the same DataFrame-in/DataFrame-out operator shape
  * to the mixing step every LLM pretraining run needs (domain weights à la
  * the public LLaMA/Pile data recipes).
  *
  * Everything here is DETERMINISTIC BY CONSTRUCTION: membership decisions
  * come from a hash of the row's stable id, never from `rand()`. That is
  * the property that matters operationally — re-running the pipeline (task
  * retry, AQE re-plan, a second epoch of the same mix) must select the
  * SAME rows, and `rand()` breaks under task re-execution. It also makes
  * every operator oracle-able: the hash is plain integer arithmetic any
  * SQL engine reproduces bit-for-bit.
  *
  * Scale shape: mixture sampling and epoch upsampling are SCAN-STAGE ops
  * (a filter / a bounded explode fused into the scan — zero shuffles, so
  * they compose with pushdown and never move the corpus). The stratified /
  * budget / quantile operators are single partitioned-window passes: one
  * shuffle on the stratum key, never a global window. The shuffle order is
  * a range-partitioned sort (or TakeOrderedAndProject under a limit) —
  * Spark's distributed sort, no single-partition exchange.
  */
object Sampling {

  /** Deterministic unit-interval hash of `id` — Knuth's multiplicative
    * hash over the low 32 bits, scaled to [0, 1). Chosen over xxhash64
    * because it is plain 64-bit integer arithmetic (`*`, `%`, `/`) that
    * any SQL engine evaluates identically, so sampling decisions can be
    * cross-checked by an external oracle. `salt` decorrelates independent
    * sampling decisions on the same id (each decision gets its own salt —
    * reusing one would nest the samples instead of crossing them).
    *
    * The multiplier is the golden-ratio constant 2654435761 = ⌊2^32/φ⌋
    * (Knuth, TAOCP vol. 3 §6.4): consecutive ids map to well-spread
    * fractions, so a filter `unitHash < p` keeps ~p of any id range —
    * including adversarially regular ones (strided, blocked) — without a
    * shuffle. The id is folded into [0, 2^31) BEFORE the multiply, so the
    * product is bounded by 2^31 × 2654435761 < 2^63 and can never overflow
    * Int64 — Spark (ANSI would error) and any SQL mirror (DuckDB raises on
    * Int64 overflow) stay bit-for-bit identical at ANY id magnitude, which
    * is the operator's whole cross-engine-reproducibility contract. Ids
    * below 2^31 hash to the same value as the unfolded form.
    */
  def unitHash(id: Column, salt: Long = 0L): Column =
    // id folds BEFORE the salt add (id + salt alone can overflow at
    // Long.MaxValue); (id % m + salt) % m == (id + salt) % m, so values are
    // unchanged wherever the unfolded form was defined
    pmod(
      pmod(pmod(id, lit(2147483648L)) + lit(salt), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
      .cast("double") / lit(4294967296.0)

  /** Domain-weighted mixture subsampling: keep each row with probability
    * `weights(domain)` — the "sample source X at 30%, source Y at 100%"
    * step of assembling a pretraining mix. Domains absent from `weights`
    * default to `defaultWeight` (0 = drop, the safe default for a curated
    * mix: an unlisted source should not leak in at full rate).
    *
    * Scale shape: the weight table becomes a literal CASE expression (the
    * map is config-sized — tens of domains, never data-sized), so the
    * whole operator is ONE scan-stage filter: no join, no shuffle, and
    * Catalyst pushes it into the parquet scan alongside user predicates.
    */
  def mixtureSample(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "mixture weights must be in [0, 1]")
    val weightExpr = weights.toSeq.sortBy(_._1).foldRight(lit(defaultWeight): Column) {
      case ((dom, w), rest) => when(col(domainCol) === lit(dom), lit(w)).otherwise(rest)
    }
    df.filter(unitHash(col(idCol), salt) < weightExpr)
  }

  /** Fractional-epoch upsampling: replicate each row `epochs(domain)`
    * times, where the fractional part is resolved per row by hash — e.g.
    * 2.3 epochs means every row appears twice and a deterministic 30%
    * subset appears a third time. This is how public pretraining recipes
    * express "see Wikipedia 3.3 times per pass over CommonCrawl".
    *
    * Emits an `epoch` column (0-based copy index) so downstream shuffling
    * can decorrelate copies ([[shuffleOrder]] salts with it).
    *
    * Scale shape: `explode(sequence(...))` fused into the scan stage — the
    * per-row copy count is computed from literals + one hash, so there is
    * no join and no shuffle; output size is exactly Σ epochs(domain)·|domain|.
    * Domains absent from `epochs` default to 1.0 (pass through unchanged —
    * upsampling is an additive adjustment, unlike [[mixtureSample]]'s
    * membership gate).
    */
  def upsampleEpochs(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      epochs: Map[String, Double],
      salt: Long = 0L): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e <= 100.0),
      "epoch factors must be in [0, 100] — a larger factor is almost " +
        "certainly a unit mistake and would explode the corpus")
    val epochExpr = epochs.toSeq.sortBy(_._1).foldRight(lit(1.0): Column) {
      case ((dom, e), rest) => when(col(domainCol) === lit(dom), lit(e)).otherwise(rest)
    }
    val copies = floor(epochExpr).cast("long") +
      when(unitHash(col(idCol), salt) < (epochExpr - floor(epochExpr)), 1L)
        .otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Stratified cap: keep at most `k` rows per stratum, chosen by hash
    * order (a deterministic uniform draw — NOT "first k by id", which
    * would bias toward old rows). The per-stratum analog of `limit`:
    * balanced eval sets, per-source caps, debugging slices.
    *
    * Scale shape: one shuffle on the stratum key + one partitioned-window
    * `row_number` pass. Never a global window; the 100 TB caveat is a
    * single mega-stratum, which this still handles (one sort per stratum,
    * spilling, not quadratic) — pre-composite the stratum key if a single
    * stratum exceeds a task's comfortable sort size.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Int,
      salt: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Token-budget selection: per group, take rows in descending quality
    * order until the token budget is exhausted — "give me the best 1B
    * tokens per language". The row that would cross the budget is EXCLUDED
    * (strict budget; the greedy prefix property makes the selection
    * order-free to verify: a row is in iff the running sum of all
    * strictly-better rows plus itself fits).
    *
    * Scale shape: one shuffle on the group key + one partitioned-window
    * running sum. Quality ties break by ascending id so the selection is
    * total-order deterministic.
    */
  def tokenBudgetSelect(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      qualityCol: Column,
      tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(qualityCol.desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("__cum_tokens") <= budget)
      .drop("__cum_tokens")
  }

  /** Quantile-gated quality filter: within each group, drop rows whose
    * score sits in the bottom `dropBelow` quantile — per-language quality
    * thresholds without hand-picking absolute cutoffs (an absolute
    * threshold tuned on English silently guts low-resource languages;
    * a per-group quantile adapts).
    *
    * Gate: `cume_dist() > dropBelow`, i.e. a row survives when MORE than
    * `dropBelow` of its group scores at or below it. Ties share a
    * cume_dist, so equal scores live or die together (no hash tiebreak —
    * a quality gate that split identical scores would be arbitrary).
    *
    * Scale shape: one shuffle on the group key + one partitioned-window
    * pass. At extreme group sizes, swap the exact cume_dist for a
    * broadcast of per-group `approx_percentile` cutoffs — same gate
    * semantics, sketch-sized state; the exact form is the oracle-able
    * reference implementation.
    */
  def quantileQualityFilter(
      df: DataFrame,
      groupCol: String,
      scoreCol: Column,
      dropBelow: Double): DataFrame = {
    require(dropBelow >= 0.0 && dropBelow < 1.0, "dropBelow must be in [0, 1)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(scoreCol.asc)
    df.withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") > dropBelow)
      .drop("__cd")
  }

  /** DSIR-shaped importance resampling (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw document by how much its
    * hashed n-gram feature distribution looks like a TARGET corpus, then
    * draw a weighted without-replacement sample of `k` — "select the k
    * CommonCrawl documents that look most like Wikipedia", the data-recipe
    * step between quality filtering and mixing.
    *
    * Construction (each piece chosen so the whole operator is bitwise
    * deterministic and oracle-able — the repo's standing bar):
    *
    *  - Features: bigrams hashed into `buckets` counters via md5 (the
    *    hashing trick; md5 is engine-portable, same construction as
    *    [[TextAnalysis.classifierScore]]'s weight lookup).
    *  - Bucket model: add-1-smoothed occurrence frequencies under the
    *    target slice and under the full raw stream; each bucket carries the
    *    likelihood ratio r_b = p_target(b) / p_raw(b) as a fixed IEEE
    *    operation sequence (two divides, one divide — identical in any
    *    engine).
    *  - Doc score: MEAN quantized ratio over the doc's bigram occurrences
    *    (`floor(r_b·2^20)` longs — order-free sums). The mean-ratio form
    *    replaces DSIR's log-likelihood sum deliberately: ln() may differ by
    *    an ulp between the JVM and DuckDB's libm, which would break the
    *    exact oracle; the ratio is monotone per bucket and keeps the
    *    "target-like scores high" ordering. Docs with no bigrams score a
    *    neutral 1.0 (the empty product of ratios), not 0 — smoothing means
    *    absence of evidence is not evidence of mismatch.
    *  - Resampling: priority sampling (Duffield–Lund–Thorup): priority
    *    q = score / u with u = (hash(id)+1)/2^32 ∈ (0, 1], take the top k
    *    by q. One IEEE divide per row — the deterministic, exactly-
    *    verifiable stand-in for Gumbel-top-k (which needs two logs).
    *
    * Scale shape: ONE bucket-keyed shuffle builds the model (target and
    * raw counts in the same aggregation — `buckets` rows out, so the
    * totals cross-join and the ratio lookup both broadcast); one doc-keyed
    * shuffle aggregates scores, with the bigram explode absorbed by
    * map-side partials. The explode is an OUTER explode, so zero-bigram
    * docs ride the same scoring pass (null bucket → no ratio → neutral
    * 1.0) — no third corpus-sized pass or docs×scores join to re-admit
    * them. The top-k is orderBy+limit = TakeOrderedAndProject,
    * distributed with no global exchange. Nothing corpus-sized moves
    * except those two shuffles.
    */
  def importanceResample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      k: Int,
      buckets: Int = 1024,
      salt: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    require(buckets > 0, "buckets must be positive")
    val Fp = 1048576.0 // 2^20 — same fixed-point scale as TextAnalysis
    val grams = when(size(TextAnalysis.tokens(col(textCol))) >= 2,
      TextAnalysis.wordShingles(col(textCol), 2))
      .otherwise(array().cast("array<string>"))
    // OUTER explode: a zero-bigram doc keeps one row with a NULL gram
    // (md5(NULL) is NULL, so its bucket is NULL) — it must still compete
    // in the priority sampling at the neutral score, and carrying it here
    // is what lets the scoring pass below cover EVERY doc without a third
    // corpus-sized join to re-admit the empties
    val occ = docs
      .select(col(idCol), targetPred.as("__tgt"), explode_outer(grams).as("__g"))
      .select(col(idCol), col("__tgt"),
        (conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long") % buckets).as("__b"))
    // one aggregation carries BOTH distributions: rc = raw occurrences,
    // tc = the target slice's occurrences (sum of a 0/1 gate). The ≤buckets-
    // row model is locally checkpointed (EAGER — the bucket model is a
    // trained artifact, same posture as the k-means codebook): without it,
    // the totals aggregation re-derives this lineage and the plan scans the
    // corpus TWICE — the exact duplicate-scan bug the checkpoint removes
    val counts = occ.filter(col("__b").isNotNull).groupBy(col("__b")).agg(
      count(lit(1)).as("__rc"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"))
      .transform(Checkpointing.materialize)
    val totals = counts.agg(
      sum(col("__rc")).as("__rtot"), sum(col("__tc")).as("__ttot"))
    // ≤`buckets` rows × 1 row: both sides broadcast; ratio math is a fixed
    // sequence of IEEE ops so the oracle reproduces it bit-for-bit
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        floor(
          ((col("__tc") + 1L).cast("double") / (col("__ttot") + lit(buckets.toLong)).cast("double")) /
            ((col("__rc") + 1L).cast("double") / (col("__rtot") + lit(buckets.toLong)).cast("double")) *
            lit(Fp)).cast("long").as("__qr"))
    // LEFT join keeps the null-bucket (zero-bigram) rows: every observed
    // bucket has a ratio row, so a real bigram never misses, and the empty
    // doc's count(__qr) = 0 routes it to the neutral 1.0 below — the
    // scoring pass covers the whole corpus in one doc-keyed shuffle whose
    // map-side partials absorb the explode
    val scored = occ
      .join(broadcast(ratios), Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__qr")).as("n_bigrams"), sum(col("__qr")).as("__qs"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") === 0L, lit(1.0))
          .otherwise((col("__qs").cast("double") / col("n_bigrams")) / lit(Fp))
          .as("score"))
    // same folded Knuth hash as unitHash (overflow-free at any id), +1 so
    // the divisor is never zero
    val u = (pmod(
      pmod(pmod(col(idCol), lit(2147483648L)) + lit(salt), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L)) + 1L)
      .cast("double") / lit(4294967296.0)
    scored
      .withColumn("priority", col("score") / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /** Reproducible global shuffle order: a hash-of-id sort key that scatters
    * any id locality (crawl order, source grouping) into a pseudorandom but
    * DETERMINISTIC training order — same corpus, same salt, same order,
    * on any cluster size. Salt with the epoch index so each pass over the
    * data sees a different permutation.
    *
    * Scale shape: `orderBy(shuffle key)` is Spark's range-partitioned
    * distributed sort (sampled range boundaries, no single-partition
    * exchange); under a `limit` it collapses to TakeOrderedAndProject.
    * At 100 TB, prefer writing the sorted output with
    * [[graft.sinks.Sinks]]' sorted layout so the order is materialized
    * once, not re-sorted per consumer.
    */
  def shuffleOrder(df: DataFrame, idCol: String, salt: Long = 0L): DataFrame =
    df.orderBy(unitHash(col(idCol), salt).asc, col(idCol).asc)

  /** Skew-proof per-key cap: keep the top `n` rows per key under the
    * caller's quality order (domain capping — "at most N documents per
    * domain, best first", the crawl-curation step that stops one boilerplate
    * mill from owning the corpus; cf. the per-source caps in the public
    * Gopher/CCNet data recipes).
    *
    * [[stratifiedSample]] draws UNIFORMLY per stratum; this keeps the BEST
    * per key — and unlike the single-window shape shared by the other
    * per-group operators here, it survives the mega-key. Two exact window
    * passes:
    *
    *  1. rank within (key, split) where split = xxhash64(id) mod
    *     `subSplits`, keep `n` — a key that floods one reducer in the
    *     single-window plan spreads over `subSplits` sort tasks, each
    *     sorting ~1/subSplits of the group;
    *  2. rank within key over the survivors — now every group is ≤
    *     subSplits·n rows, so the second sort is bounded no matter how
    *     large the original key was.
    *
    * Exact by construction: the order (orderCols, id) is TOTAL, and every
    * row of the true per-key top-n is also in the top-n of its own split
    * (dropping other-split rows only improves a row's local rank), so pass
    * 1 never discards a final survivor. The split hash must be xxhash64,
    * not a multiplicative fold: a low-bit salt collapses to one split
    * whenever the key was itself assigned by `mod` (the partition-collapse
    * failure [[graft.sinks.Sinks]]' clusterByShard documents).
    *
    * Scale shape: two shuffles — (key, split) then key — both with bounded
    * sort sizes; nothing corpus-sized moves after pass 1's filter. At
    * `subSplits = 1` the plan degenerates to the classic single window
    * (pass 2 re-ranks pass 1's output of exactly the answer).
    */
  def cappedPerKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      orderCols: Seq[Column],
      n: Int,
      subSplits: Int = 32): DataFrame = {
    require(n > 0, "n must be positive")
    require(subSplits > 0, "subSplits must be positive")
    import org.apache.spark.sql.expressions.Window
    val order = orderCols :+ col(idCol).asc
    val split = pmod(xxhash64(col(idCol)), lit(subSplits.toLong))
    val local = Window.partitionBy(col(keyCol), split).orderBy(order: _*)
    val global = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(global))
      .filter(col("__rn") <= n)
      .drop("__lrn", "__rn")
  }

  /** Group-leakage-safe train/holdout split: the side is decided by the
    * UNIT HASH OF THE GROUP KEY, so every row of a group — a duplicate
    * cluster's members, one user's sessions, one document's chunks — lands
    * on ONE side. A row-level split leaks correlated rows into the
    * holdout (a near-dup of a training doc in the eval set measures
    * memorization, not generalization); splitting by the cluster
    * representative is the decontamination-grade form.
    *
    * Scale shape: whatever produced the group key (an exact-dup min-id, a
    * CC representative) plus ONE scan-stage Column decision — no extra
    * shuffle, no RNG (retried tasks agree, and DuckDB replays the
    * assignment bit-for-bit via the sqlUnitHash mirror).
    */
  def groupSplit(df: DataFrame, groupCol: String, holdoutFrac: Double,
      salt: Long = 0L, splitCol: String = "split"): DataFrame = {
    require(holdoutFrac > 0.0 && holdoutFrac < 1.0,
      s"holdoutFrac must be in (0, 1), got $holdoutFrac")
    // case-insensitive: withColumn resolves names case-insensitively under
    // the default spark.sql.caseSensitive=false, so "Split" would clobber
    require(!df.columns.exists(_.equalsIgnoreCase(splitCol)),
      s"groupSplit would clobber the existing column '$splitCol' — pass a free splitCol")
    df.withColumn(splitCol,
      when(unitHash(col(groupCol), salt) < holdoutFrac, lit("holdout"))
        .otherwise(lit("train")))
  }
}
