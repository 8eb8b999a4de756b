package graft

/** Whole-surface plan guard: planning-time regression net over EVERY
  * SparkEntry query. The per-operator specs assert their own plans in
  * detail; this sweep freezes the two properties that silently rot at
  * 100 TB — an accidental cartesian (a join that lost its equi-keys) and a
  * UDF fallback (an expression that fell out of codegen) — across the whole
  * surface at once, with an explicit, reasoned allowlist.
  */
class PlanGuardSpec extends SparkTestBase {

  // plans that legitimately cross a BOUNDED side (a scalar or a <=k-row
  // invariant/query frame, broadcast) — the documented tiny-side patterns.
  // The list is exact in both directions: a query outside it must not plan
  // a cartesian, and an entry whose plan no longer crosses is stale.
  private val crossAllowed: Map[String, String] = Map(
    "ann_topk_join" -> "<=5-row query side broadcast against the corpus",
    "knn_classify" -> "<=5-row query side broadcast against the corpus (topKJoin)",
    "sql_surface_topk" -> "1-row WITH q subquery crossed in SQL",
    "tfidf_top_terms" -> "1-row corpus-count scalar broadcast",
    "vocab_coverage" -> "1-row vocab-size scalar broadcast",
    "dsir_select" -> "1-row bucket-totals scalar crossed into the <=1024-row model",
    "bloom_prune_check" -> "1-row invariant frames unioned with the counts",
    "kmv_overlap" -> "two 1-row global aggregates (exact counts x sketch estimates) crossed",
    "kmv_matrix" -> ("the |segments|-row sketch table self-crossed on seg_a < seg_b — " +
      "S² pairs of k-long arrays, bounded by the segment census, never data-sized"),
    "token_fingerprint" -> "1-row invariant frames unioned with the counts",
    "minhash_dedup_docs" -> "dedupInvariants 1-row check frames",
    "simhash_dedup_docs" -> "dedupInvariants 1-row check frames",
    "ngram_jaccard_dedup_docs" -> "dedupInvariants 1-row check frames",
    "incremental_minhash_dedup" -> "incrementalGateInvariants 1-row check frames",
    "drift_report" -> ("1-row totals and 1-row TVD scalars broadcast back onto " +
      "the |buckets|-sized share table (the literal join key folds away)")
  )

  // plans that carry a Scala UDF on purpose, with the reason it is exempt
  // from the functions-not-UDFs rule
  private val udfAllowed: Map[String, String] = Map(
    "resize_meta" -> ("resize kernel is a whole-payload codec call, not row " +
      "arithmetic — nothing for codegen to fuse; payload stays binary")
  )

  // plans that legitimately run a Window with an EMPTY partition spec — the
  // pattern that moves its whole input to one partition and is the classic
  // 100 TB scale-killer. Only bounded inputs may appear here, with the bound
  // stated. Exact in both directions, like the cartesian list.
  private val globalWindowAllowed: Map[String, String] = Map(
    "vocab_coverage" -> ("rank/cumsum window runs AFTER a limit(50) " +
      "(TakeOrderedAndProject), so its input is <=50 rows by construction"),
    "hybrid_rrf" -> ("the cosine-rail rank window runs AFTER " +
      "bruteForceTopK's TakeOrderedAndProject(k=30), so its input is " +
      "<=30 rows by construction")
  )

  // The three sweeps below drive graft.plans.PlanAdvisor — the library's
  // typed plan-warning surface — across every query, so the ADVISOR's
  // detectors are what this suite regression-tests (one source of truth;
  // a pipeline running with advisor.mode=fail gets exactly these checks).
  private lazy val adviceByQuery: Map[String, Seq[graft.plans.PlanAdvisor.PlanWarning]] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> graft.plans.PlanAdvisor.advise(fn(spark, sfDir))
    }.toMap

  test("no query plans an unbounded cartesian or nested-loop join") {
    import graft.plans.PlanAdvisor.CartesianJoin
    val crossing = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[CartesianJoin]) => name
    }.toSet
    val offenders = crossing -- crossAllowed.keySet
    assert(offenders.isEmpty, s"unexpected cartesian/nested-loop in: $offenders")
    val stale = crossAllowed.keySet -- crossing
    assert(stale.isEmpty, s"allowlisted but no longer crossing (remove): $stale")
  }

  test("no query falls back to a Scala UDF outside the allowlist") {
    // PlanAdvisor walks the expression trees for ScalaUDF nodes rather than
    // string-matching "UDF(" — a named UDF prints under its registered name
    // and would escape a substring check
    import graft.plans.PlanAdvisor.UdfFallback
    val carrying = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[UdfFallback]) => name
    }.toSet
    val offenders = carrying -- udfAllowed.keySet
    assert(offenders.isEmpty, s"unexpected UDF fallback in: $offenders")
    val stale = udfAllowed.keySet -- carrying
    assert(stale.isEmpty, s"allowlisted but no longer carrying a UDF (remove): $stale")
  }

  test("no query plans a Window over a single global partition") {
    import graft.plans.PlanAdvisor.GlobalWindow
    val global = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[GlobalWindow]) => name
    }.toSet
    val offenders = global -- globalWindowAllowed.keySet
    assert(offenders.isEmpty, s"single-partition Window in: $offenders")
    val stale = globalWindowAllowed.keySet -- global
    assert(stale.isEmpty, s"allowlisted but no longer global-windowing (remove): $stale")
  }

  test("no query funnels the dataflow into one partition") {
    import graft.plans.PlanAdvisor.SinglePartitionFunnel
    val funneling = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[SinglePartitionFunnel]) => name
    }.toSet
    assert(funneling.isEmpty,
      s"repartition(1)/coalesce(1) in: $funneling — nothing on the surface may funnel")
  }

  // scans whose residual (post-decode) filter legitimately cannot translate
  // to a parquet predicate, with the reason the full-decode is acceptable.
  // Two shapes qualify: deterministic hash/mod sampling gates (the VALUE of
  // the gate is a function of the row — no storage predicate can express
  // it, and the operators' contract is precisely "one scan-stage cut, no
  // shuffle") and text-derived quality gates (the score IS computed from
  // the decoded text). Catalyst's IsNotNull guards over computed join keys
  // are exempted inside the advisor itself, not here.
  private val unpushedAllowed: Map[String, String] = Map(
    "mixture_sample" -> "unit-hash sampling gate — scan-stage by contract",
    "weighted_mix" -> "per-lang mod-hash sampling gate — scan-stage by contract",
    "epoch_upsample" -> "fractional-epoch hash gate — scan-stage by contract",
    "upsert_orders" -> "mod-gate splits base/delta from one table in the fixture",
    "incremental_dedup" -> "mod-gate splits corpus/batch from one table in the fixture",
    "incremental_dedup_table" -> "mod-gate splits corpus/batch from one table in the fixture",
    "incremental_minhash_dedup" -> "mod-gate splits corpus/batch from one table in the fixture",
    "drift_report" -> "mod-gate splits corpus/batch from one table in the fixture",
    "semantic_contamination" -> "mod-gate carves the eval slice from one table in the fixture",
    "contamination_check" -> "mod-gate carves the eval set; shingle overlap needs the text",
    "quality_filter" -> "quality scores are computed FROM the decoded text",
    "curation_pipeline" -> "composed quality + token gates over the decoded text",
    "doc_chunks" -> "non-empty-token gate over the decoded text",
    "bm25_topk" -> ("size(tokens(text)) > 0 is Catalyst's own " +
      "InferFiltersFromGenerate gate ahead of the postings explode — " +
      "computed FROM the decoded text, and row-reducing, not a loss"),
    "hybrid_rrf" -> "same inferred non-empty-token gate on the BM25 rail",
    "hh_dashboard" -> ("size(hh) > 0 is Catalyst's InferFiltersFromGenerate " +
      "gate ahead of the state-map explode — and the scan it rides is the " +
      "groups×capacity-sized state sidecar, never a corpus"),
    "ivf_topk" -> ("in-memory probe filters on the computed centroid; the " +
      "persisted-index path (writeIvfIndex) turns the same filter into " +
      "partition pruning — ScaleLayoutSpec asserts it"),
    "ivfpq_topk" -> ("same as ivf_topk: the composed index probes on the " +
      "computed centroid in memory; persisted partitionBy(centroid_id) the " +
      "filter is partition pruning")
  )

  test("every deterministic scan filter on the surface reaches the source") {
    import graft.plans.PlanAdvisor.UnpushedScanFilters
    val unpushed = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[UnpushedScanFilters]) => name
    }.toSet
    val offenders = unpushed -- unpushedAllowed.keySet
    assert(offenders.isEmpty,
      s"scan filters that cannot push to parquet in: $offenders — " +
        "rewrite over raw columns or allowlist with the decode-cost rationale")
    val stale = unpushedAllowed.keySet -- unpushed
    assert(stale.isEmpty, s"allowlisted but now fully pushed (remove): $stale")
  }

  // queries that deliberately materialize a full total order (sorted-layout
  // writes, order-sensitive sinks), with the consumer of that order named.
  // A range sort IS distributed (sampled range partitioning, no single
  // task) — the budget question is only whether anything consumes the order.
  private val globalSortAllowed: Map[String, String] = Map(
    "flagship_events" -> ("the reference query model's sortBy (§2.6) — " +
      "ordered output is the flagship's contract"),
    "events_query_model" -> "QuerySpec.sortBy under test — the §2.6 sort operator itself",
    "events_scan_v2" -> "same declarative query as events_query_model via DSv2"
  )

  test("no query pays for a total order nothing consumes") {
    import graft.plans.PlanAdvisor.GlobalSort
    val sorting = adviceByQuery.collect {
      case (name, ws) if ws.exists(_.isInstanceOf[GlobalSort]) => name
    }.toSet
    val offenders = sorting -- globalSortAllowed.keySet
    assert(offenders.isEmpty,
      s"global sort without a limit in: $offenders — under a limit Spark " +
        "plans TakeOrderedAndProject; a bare total order needs a named consumer")
    val stale = globalSortAllowed.keySet -- sorting
    assert(stale.isEmpty, s"allowlisted but no longer globally sorting (remove): $stale")
  }

  // Exchange-count budget for the surface's most expensive queries, counted
  // on the fully-prepared plan (EnsureRequirements has inserted every
  // exchange) with AQE off so the number is planning-time deterministic.
  // An accidental extra shuffle — a lost partitioning, a join that stopped
  // broadcasting, a stray repartition — fails HERE with a named query
  // rather than surfacing as an unexplained bench regression. Counts are
  // pinned at the spec's sf0.001 (broadcast thresholds shape joins); the
  // REASON records what the exchanges pay for, so a legitimate re-plan
  // updates the pin consciously.
  private val shuffleBudget: Map[String, (Int, String)] = Map(
    // scan-stage sampling: the whole point is the corpus does not move
    "mixture_sample" -> (0, "weighted sampling is one scan-stage filter"),
    "epoch_upsample" -> (0, "epoch explode fuses into the scan"),
    "train_order" -> (0, "orderBy+limit collapses to TakeOrderedAndProject"),
    // one-exchange workhorses
    "q1_agg" -> (1, "partial→final agg exchange on the group keys"),
    "flagship_events" -> (1, "final sort exchange of the filtered scan"),
    "exact_dedup_docs" -> (1, "the operator contract: ONE digest-keyed shuffle"),
    "pack_sequences" -> (1, "one group-key repartition, then a narrow stateful pass"),
    "salted_join_agg" -> (1, "build side broadcasts at this sf; agg exchange remains"),
    "q3_topk_join" -> (1, "dims broadcast at this sf; agg exchange + distributed top-k"),
    "ivf_topk" -> (1, "codebook/probe sides broadcast; one exchange builds the lists"),
    "token_budget_select" -> (1, "one partitioned-window exchange on the group key"),
    "quantile_gate" -> (1, "one partitioned-window exchange on the group key"),
    "uniform_stratum_sample" -> (1, "one partitioned-window exchange on the stratum key"),
    // analytics: one user-keyed exchange feeds all window passes + final agg
    "asof_join_native" -> (3, "the two co-partitioned key exchanges feeding " +
      "AsOfJoinExec's streaming merge + the (key, ts) exchange inside the " +
      "tiebreak pre-dedup"),
    "asof_join_forward_native" -> (3, "same shape as asof_join_native with " +
      "ts sorted descending (the mirrored forward merge)"),
    "funnel_conversion" -> (2, "user-key exchange reused by 3 windows; tiny final agg"),
    "retention_cohorts" -> (2, "user-key exchange + cohort-grid agg"),
    "leakage_safe_split" -> (1, "one digest-keyed rep aggregation; the " +
      "classes-sized rep table broadcasts back at this sf"),
    "k_anonymity" -> (2, "the census countDistinct plans the two-level " +
      "aggregate: (QI keys + sensitive) then QI keys"),
    "heavy_hitters_by_lang" -> (2, "one lang-keyed sketch agg + one " +
      "(lang, token) count agg; the materialized count table serves N, " +
      "the threshold filter and the probe join without new exchanges"),
    // multi-stage pipelines: each number is the audited stage count
    "segment_dedup" -> (3, "segment-key agg (2-phase) + doc-id regroup"),
    "duplicate_spans" -> (3, "spread probe + ONE fingerprint-keyed exchange " +
      "(count-over-window doubles as the dup census — no groupBy, no " +
      "semi-join, no second window explode) + doc-keyed coverage window"),
    "embed_dedup" -> (4, "LSH bucket join + component resolution + survivor semi-join"),
    "kmv_overlap" -> (4, "one seg-keyed sketch agg + the exact rail's " +
      "(seg,user) distinct, user regroup and 1-row global agg; the two " +
      "1-row frames cross via broadcast"),
    "kmv_matrix" -> (6, "seg sketch agg + the exact rail (pair self-join " +
      "over the distinct (seg,user) frame, pair agg, size agg); the S-row " +
      "matrix self-cross adds none"),
    "tfidf_top_terms" -> (5, "term df agg, doc tf agg, join, per-doc top-k window"),
    "curation_pipeline_v2" -> (4, "gates checkpoint once (classifier is pure " +
      "scan-stage, the LM census aggregates the corpus explode ONCE and derives " +
      "the prefix marginal from the distinct-bigram table); the visible plan is " +
      "segment dedup + packing over the checkpointed survivors"),
    "semantic_dedup" -> (5, "distributed Lloyd (assign+update) + cluster pair " +
      "verify; the assignment (with its distinct-content shuffle) checkpoints " +
      "once for its five consumers"),
    "kmeans_clusters" -> (2, "spread guard + ONE profile agg; codebook join broadcasts"),
    "cluster_balanced_sample" -> (2, "spread guard + ONE cluster-key window exchange"),
    "knn_classify" -> (2, "spread guard + query-id TopKAgg exchange; label join and " +
      "vote window ride the tiny aggregated side"),
    "scd2_history" -> (1, "ONE key exchange shared by the lag and lead windows"),
    "bpe_segment" -> (0, "the merge-table replay is a scan-stage replace chain " +
      "inside a transform — zero shuffles by contract"),
    "pq_ann_topk" -> (1, "spread guard; training/encoding are scan-stage " +
      "projections against broadcast codebooks, ADC is a fold over the packed " +
      "long, top-k collapses to TakeOrderedAndProject"),
    "pq_ann_refined" -> (1, "the ADC shortlist's spread guard; the rerank is a " +
      "broadcast semi-join + TakeOrderedAndProject — no extra exchange"),
    "ivfpq_topk" -> (1, "one composed-index spread guard; probe filter + ADC " +
      "ride the scan stage"),
    "image_dhash" -> (0, "decode → resample → gradient hash is one scan-stage " +
      "flatMap; zero shuffles by contract"),
    "image_dedup" -> (4, "band explode feeds the candidate self-join (2 " +
      "exchanges), verified drops distinct, survivors anti-join — the " +
      "pigeonhole-exact LSH plan"),
    "audio_fingerprint" -> (0, "WAV decode → windowed energies → sign hash is " +
      "one scan-stage flatMap; zero shuffles by contract"),
    "drift_report" -> (3, "ONE bucket-keyed count aggregation + the two 1-row " +
      "scalar re-attach aggs (totals, fixed-point TVD); the data is scanned " +
      "once and shuffled once"),
    "dsir_select" -> (2, "per-doc score agg + the trivial 1024-row totals " +
      "collapse; the outer explode carries zero-bigram docs through the " +
      "scoring pass so the old all-docs left join (and its docs-side " +
      "exchange) is gone, the corpus-sized bucket agg runs ONCE inside the " +
      "model checkpoint, model/totals broadcast, top-k is TakeOrdered"),
    "containment_dedup" -> (7, "spread guard + shingle-df agg + df-cut join + pair agg " +
      "+ denominator agg + best-containment agg + survivor resolution"),
    "doc_pagerank" -> (7, "one destination-keyed contribution agg per iteration (×5) " +
      "+ rank/node join exchanges; adjacency is checkpointed once, not re-derived"),
    "entity_resolution" -> (3, "input⋈labels left join (2 key exchanges) + " +
      "entity-window exchange; block census, pair join and CC rounds run " +
      "behind connectedComponents' per-round localCheckpoints"),
    "value_outliers" -> (3, "ONE event_type exchange REUSED by both median " +
      "windows + one for the MAD-deviation ranks + the final report agg; " +
      "per-group medians broadcast back onto the corpus"),
    "pit_status_lookup" -> (1, "ONE custkey exchange feeds both SCD2 windows " +
      "(lag + lead); the derived history broadcasts into the point-in-time " +
      "range join at this sf"),
    "interval_overlap_join" -> (2, "one session-agg + one window-agg " +
      "exchange; the bucket equi-join broadcasts the tiny type-window side " +
      "at this sf and dedupes by first shared bucket — no distinct shuffle"),
    "jl_project_check" -> (0, "JL projection is a pure scan-stage map — " +
      "the whole point: the corpus never moves"),
    "jl_ann_topk" -> (1, "projection fuses into the scan; spread guard " +
      "exchange; top-k is TakeOrderedAndProject"),
    "doc_triangles" -> (7, "per-doc + both-endpoint degree census (2) + " +
      "orientation joins (2) + wedge self-join + closure join + final " +
      "left-join resolution; edge list and oriented list checkpoint once"),
    "remove_duplicate_spans" -> (3, "ONE fingerprint-keyed keep-first window " +
      "(row_number>1 doubles as the dup census — no groupBy, no semi-join) + " +
      "per-doc excised-interval agg + the rebuild join's toks-side exchange"),
    "curation_pipeline_v3" -> (4, "gates checkpoint once (see v2); span " +
      "excision's keep-first window/interval aggs (census fused into the " +
      "window) + packing; lang rides carryCols — no re-join"),
    "curation_pipeline_v4" -> (4, "the DECLARED pipeline: gates + scrub + " +
      "pseudonymize all fuse into the stage behind the checkpoint (the PII " +
      "steps are projections — zero exchanges of their own); after it, " +
      "segment dedup's spread + keep-first window + doc regroup and the " +
      "packing repartition; src_token rides segmentDedup's carryCols"),
    "incremental_minhash_dedup" -> (11, "within-batch LSH dedup + banded corpus " +
      "confirm + the invariants' independent exact recomputations (digest " +
      "joins + full gram-hash inverted index)"),
    "classifier_train" -> (0, "every training iteration materializes behind a " +
      "checkpoint (the feature shuffle and margin/gradient aggs run inside); " +
      "the returned weight table is a filter over the final checkpoint"),
    "trained_classifier_filter" -> (0, "inference is a pure scan-stage fold: " +
      "the bucket-bounded weight table rides the closure as a literal lookup " +
      "array, so scoring moves zero bytes (training materializes behind the " +
      "classifier_train checkpoint)"),
    "q4_exists_late" -> (1, "the DECLARED EXISTS decorrelates to a LeftSemi " +
      "join (broadcast at this sf) carrying the correlated date predicate " +
      "as its join condition; only the priority-agg exchange remains — the " +
      "pin is the proof decorrelation ran, not a per-outer-row re-scan"),
    "q17_small_quantity" -> (2, "the correlated scalar avg decorrelates to " +
      "ONE per-part aggregate pass over lineitem (its exchange) joined back " +
      "broadcast + the single-group final agg exchange"),
    "q21_waiting_supplier" -> (3, "both correlated polarities decorrelate: " +
      "EXISTS to a LeftSemi (broadcast at this sf), NOT EXISTS to a " +
      "LeftAnti sort-merge on l_orderkey (its two key exchanges) + the " +
      "supplier-agg exchange; top-k is TakeOrderedAndProject"),
    "q22_idle_balance" -> (1, "the uncorrelated scalar threshold computes " +
      "once and pushes INTO the parquet scan as a runtime predicate; NOT " +
      "EXISTS decorrelates to a LeftAnti broadcast join — only the " +
      "nation-agg exchange remains"),
    "q20_nested_in_suppliers" -> (1, "the NESTED correlation decorrelates " +
      "inside-out: the correlated scalar avg becomes ONE grouped aggregate " +
      "over lineitem (its exchange — the only one) joined back Inner, the " +
      "part-name IN a LeftSemi, the outer IN a LeftSemi probing supplier; " +
      "a failed decorrelation would plan per-row re-scans instead"),
    "q19_disjunctive_revenue" -> (1, "CNF extraction pushes each side's " +
      "branch-union into its parquet scan, the equi-key survives as a " +
      "broadcast hash join with the residual disjunction as the join " +
      "condition — only the single-group agg exchange remains"),
    "q13_order_distribution" -> (2, "per-custkey count exchange + the " +
      "distribution exchange; both aggs partial map-side, so the ~40-value " +
      "c_count skew collapses before its exchange; the ON-clause filter " +
      "stays a right-side scan predicate under the preserved LeftOuter"),
    "q2_min_cost_shipment" -> (3, "the join-bodied correlated scalar " +
      "decorrelates to ONE (lineitem x orders-broadcast) min aggregate " +
      "grouped by partkey (its exchange) joined back sort-merge on " +
      "(partkey, price=min) — the other two exchanges are that join's " +
      "keys; ties at the minimum all survive, never a per-part re-join"),
    "q15_top_supplier" -> (1, "the twice-referenced revenue aggregate " +
      "plans ONE exchange in the main branch; the uncorrelated scalar MAX " +
      "is its own subquery plan whose single-row result broadcasts into " +
      "the post-agg filter — never a per-row re-aggregation"),
    "q14_promo_share" -> (1, "both the conditional and total sums fuse " +
      "into ONE aggregate pass over one (lineitem x part-broadcast) join " +
      "— the single-group agg exchange is the only one; a second scan per " +
      "numerator would double it"),
    "q7_volume_pairs" -> (1, "every dim broadcasts at this sf, CNF " +
      "extraction pushes the (symmetric) branch-union into the nation " +
      "scan and the second copy REUSES the broadcast exchange, so the " +
      "pair-grouped agg exchange is the only one; a failed extraction " +
      "post-join-filters full nation scans"),
    "q6_forecast_revenue" -> (1, "no join at all: all three range " +
      "predicates push to the lineitem scan, so the plan is scan → " +
      "partial sum → the single-row final-agg exchange — nothing else"),
    "q8_market_share" -> (1, "every dimension (part, orders-as-dim, " +
      "customer, both nation copies, region, supplier) broadcasts at this " +
      "sf and both CASE sums fuse into ONE aggregate pass — the per-year " +
      "agg exchange is the only one"),
    "q9_profit_by_nation" -> (1, "the infix LIKE pushes to the part scan " +
      "as StringContains, dims broadcast, and the (nation, year) agg " +
      "partial map-side — its exchange is the only one"),
    "q10_returned_items" -> (1, "returnflag pushes to lineitem, the date " +
      "range to orders, dims broadcast; the customer-tuple agg exchange " +
      "is the only one — the LIMIT is TakeOrderedAndProject, never a " +
      "global sort exchange"),
    "q12_priority_lines" -> (1, "both conditional counts fuse into ONE " +
      "aggregate pass over ONE orders⋈lineitem join (orders broadcasts " +
      "at this sf) — a scan per conditional would double the exchanges"),
    "q16_supplier_relation" -> (2, "the NOT IN plans the null-aware anti " +
      "broadcast join, part broadcasts, and the single count(DISTINCT " +
      "l_suppkey) lowers to the two-level aggregate — dedup on " +
      "(profile, suppkey) + count per profile, one exchange each, no " +
      "Expand needed and never a re-aggregation per profile"),
    "multi_distinct_agg" -> (2, "the Expand rewrite: one scan feeding " +
      "Expand (one projection per distinct group + one plain), the " +
      "(flag, col, gid) partial-agg exchange, then the flag-level final " +
      "exchange — never a scan-and-join per distinct column"),
    "rollup_multi_distinct" -> (2, "the stacked Expand rewrites (rollup's " +
      "grouping-set tuples x the distinct groups) still plan ONE scan and " +
      "the same two agg exchanges as the flat multi-distinct — never a " +
      "re-aggregation per grouping set per distinct column"),
    "minhash_dedup_docs" -> (8, "exact-collapse + banded bucket joins + CC + invariants"),
    "simhash_dedup_docs" -> (8, "exact-collapse + banded bucket joins + CC + invariants"),
    "ngram_jaccard_dedup_docs" -> (8, "exact-collapse + shingle joins + CC + invariants")
  )

  test("flagship queries keep their pinned exchange counts") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val actual = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      shuffleBudget.keySet.toSeq.sorted.map { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        name -> plan.collect { case e: ShuffleExchangeExec => e }.size
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    val drifted = actual.filter { case (name, n) => n != shuffleBudget(name)._1 }
    assert(drifted.isEmpty, drifted.map { case (name, n) =>
      s"$name plans $n exchanges, pinned ${shuffleBudget(name)._1} " +
        s"(${shuffleBudget(name)._2})"
    }.mkString("; "))
  }

  test("with auto-broadcast disabled no join degrades to a nested loop or cartesian") {
    // Several exchange pins are justified by "the dim side broadcasts at
    // this sf" — at 100× the dims exceed the threshold and the planner
    // re-shapes. This sweep plans the WHOLE surface with auto-broadcast off
    // (hint-forced broadcasts keep working: a hint is a deliberate
    // bounded-size assertion) and asserts the fallback for every join is a
    // shuffled join (sort-merge / shuffled-hash), never a nested-loop or
    // cartesian — the two shapes that go quadratic when a dim outgrows the
    // threshold. Queries in crossAllowed cross a PROVEN-bounded side by
    // design and keep their documented shape.
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val conf = spark.conf
    val savedB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedA = conf.get("spark.sql.adaptive.enabled", "true")
    val offenders = try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val bad = plan.collect {
          case j: BroadcastNestedLoopJoinExec => j.getClass.getSimpleName
          case j: CartesianProductExec => j.getClass.getSimpleName
        }
        if (bad.nonEmpty) Some(name -> bad.distinct.mkString(",")) else None
      }.toMap
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedB)
      conf.set("spark.sql.adaptive.enabled", savedA)
    }
    val unexpected = offenders.keySet -- crossAllowed.keySet
    assert(unexpected.isEmpty, unexpected.toSeq.sorted.map { n =>
      s"$n plans ${offenders(n)} without auto-broadcast — at scale this " +
        "join goes quadratic; give it equi-keys or a reasoned allowlist entry"
    }.mkString("; "))
  }

  // plan with AQE off: AdaptiveSparkPlanExec hides its inner plan from
  // collect(), so shape assertions need the static physical plan
  private def staticPlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q19: CNF extraction pushes each side's branch-union into its scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan("q19_disjunctive_revenue")
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 2, s"expected part + lineitem scans, got ${scans.size}")
    def pushedOr(s: FileSourceScanExec): Seq[String] =
      s.metadata.get("PushedFilters").toSeq.filter(_.contains("Or("))
    val partScan = scans.find(_.metadata("Location").contains("part.parquet"))
    val lineScan = scans.find(_.metadata("Location").contains("lineitem.parquet"))
    assert(partScan.exists(s => pushedOr(s).exists(f =>
      f.contains("p_brand") && f.contains("p_size"))),
      "part scan must carry the pushed brand/size branch-union — " +
        s"got ${partScan.map(_.metadata("PushedFilters"))}")
    assert(lineScan.exists(s => pushedOr(s).exists(f =>
      f.contains("l_quantity"))),
      "lineitem scan must carry the pushed quantity branch-union — " +
        s"got ${lineScan.map(_.metadata("PushedFilters"))}")
    // the equi-key survives CNF extraction: a hash join on the part key,
    // not a nested loop evaluating the disjunction per pair
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val equi = plan.collect {
      case j: BroadcastHashJoinExec => j.leftKeys ++ j.rightKeys
      case j: SortMergeJoinExec => j.leftKeys ++ j.rightKeys
      case j: ShuffledHashJoinExec => j.leftKeys ++ j.rightKeys
    }.flatten
    assert(equi.exists(_.references.toSeq.exists(_.name == "l_partkey")),
      "join must keep p_partkey = l_partkey as its equi-key")
  }

  test("q13: the ON-clause filter stays below the preserved outer join") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.execution.joins.HashJoin
    val plan = staticPlan("q13_order_distribution")
    // the join survives as LEFT OUTER — a WHERE-placement bug (filter
    // migrating above the join) lets Catalyst rewrite it inner and drop
    // every order-less customer
    val outer = plan.collect {
      case j: HashJoin if j.joinType == LeftOuter => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType == LeftOuter => j
    }
    assert(outer.nonEmpty, s"LeftOuter join must survive:\n${plan.treeString.take(1500)}")
    // and the priority filter reaches the ORDERS scan as a pushed predicate
    val ordersScan = plan.collect { case s: FileSourceScanExec
      if s.metadata("Location").contains("orders.parquet") => s }
    assert(ordersScan.exists(_.metadata.get("PushedFilters")
      .exists(f => f.contains("o_orderpriority") && f.contains("Not"))),
      "orders scan must carry the pushed NOT-urgent predicate — " +
        s"got ${ordersScan.map(_.metadata("PushedFilters"))}")
  }

  test("q20: the nested correlation fully decorrelates (semi joins + one grouped agg)") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.joins.HashJoin
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val plan = staticPlan("q20_nested_in_suppliers")
    val semis = plan.collect { case j: HashJoin if j.joinType == LeftSemi => j }
    assert(semis.size >= 2,
      s"both INs must lower to semi joins, got ${semis.size}:\n${plan.treeString.take(1500)}")
    // the correlated scalar avg became a grouped aggregate keyed by BOTH
    // correlation columns — one pass over lineitem, not per-outer-row
    val aggKeyed = plan.collect { case a: HashAggregateExec
      if a.groupingExpressions.size == 2 => a }
    assert(aggKeyed.nonEmpty,
      "the scalar avg must decorrelate to a (l_partkey, l_suppkey)-grouped aggregate")
  }

  test("q7: each nation copy's branch-union pushes into its own scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan("q7_volume_pairs")
    // CNF extraction derives n_name IN (A, B) for BOTH nation copies; each
    // must reach its parquet scan as a pushed Or/In over n_name
    val nationScans = plan.collect { case s: FileSourceScanExec
      if s.metadata("Location").contains("nation.parquet") => s }
    assert(nationScans.nonEmpty, "the nation scan disappeared")
    nationScans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("n_name") && (pushed.contains("Or(") || pushed.contains("In(")),
        s"each nation copy must carry its pushed branch-union — got $pushed")
    }
    // the pair predicate is symmetric, so CNF gives BOTH copies the same
    // branch-union — the planner proves the two nation subplans identical
    // and REUSES one broadcast exchange instead of scanning twice. Accept
    // either shape, but a single scan must come with the reuse node.
    if (nationScans.size == 1) {
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      assert(plan.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        "one nation scan without a ReusedExchange means a copy lost its scan")
    }
  }

  test("q6: all three predicates reach the lineitem scan as PushedFilters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan("q6_forecast_revenue")
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"q6 is a single-scan query, got ${scans.size}")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    for (col <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(col),
        s"$col must reach the scan as a pushed predicate — got $pushed")
    // and the projection prunes: three referenced columns, nothing else
    val read = scans.head.metadata.getOrElse("ReadSchema", "")
    assert(!read.contains("l_orderkey") && !read.contains("l_tax"),
      s"scan must prune to the referenced columns — got $read")
  }

  test("q9: the infix LIKE pushes to the part scan as a contains filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan("q9_profit_by_nation")
    val partScan = plan.collect { case s: FileSourceScanExec
      if s.metadata("Location").contains("part.parquet") => s }
    assert(partScan.exists(_.metadata.get("PushedFilters")
      .exists(f => f.contains("p_name") && f.contains("Contains"))),
      "'%widget%' must reach the part scan as StringContains — got " +
        s"${partScan.map(_.metadata("PushedFilters"))}")
  }

  test("q10: the revenue LIMIT plans TakeOrderedAndProject, never a global sort") {
    import org.apache.spark.sql.execution.{TakeOrderedAndProjectExec, SortExec}
    val plan = staticPlan("q10_returned_items")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject:\n${plan.treeString.take(1200)}")
    assert(plan.collect { case s: SortExec if s.global => s }.isEmpty,
      "a global sort under a LIMIT 20 means the top-k rewrite was lost")
  }

  test("q16: the NOT IN plans null-aware, feeding the two-level distinct rewrite") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val plan = staticPlan("q16_supplier_relation")
    val naaj = plan.collect { case j: BroadcastHashJoinExec
      if j.joinType == LeftAnti && j.isNullAwareAntiJoin => j }
    assert(naaj.nonEmpty,
      s"the NOT IN must plan the null-aware anti join:\n${plan.treeString.take(1200)}")
    // a SINGLE count(DISTINCT) with no sibling aggregates needs no Expand:
    // the rewrite is the two-level aggregate — dedup on (profile, suppkey),
    // then count per profile. Pin both levels so a regression to a
    // per-profile re-scan (or a pointless Expand) shows up as a key-width
    // change.
    val groupWidths = plan.collect { case a: HashAggregateExec =>
      a.groupingExpressions.size }.distinct.sorted
    assert(groupWidths == Seq(3, 4),
      s"expected the (profile+suppkey=4)-then-(profile=3) two-level " +
        s"distinct rewrite, got grouping widths $groupWidths")
  }

  test("multi-distinct: the Expand rewrite plans one scan, never a join per distinct") {
    import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec}
    val plan = staticPlan("multi_distinct_agg")
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"one lineitem scan must feed every distinct group, got ${scans.size}")
    val expands = plan.collect { case e: ExpandExec => e }
    assert(expands.size == 1, s"the rewrite plans exactly one Expand, got ${expands.size}")
    // one projection per distinct column + one for the plain aggregates
    assert(expands.head.projections.size == 3,
      s"Expand must carry 3 projections (2 distinct groups + plain), " +
        s"got ${expands.head.projections.size}")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "the rewrite must not plan any join")
  }

  test("rollup x multi-distinct: the stacked Expands share one scan") {
    import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec}
    val plan = staticPlan("rollup_multi_distinct")
    assert(plan.collect { case s: FileSourceScanExec => s }.size == 1,
      "one orders scan must feed every (grouping set x distinct group) pair")
    val expands = plan.collect { case e: ExpandExec => e }
    assert(expands.size == 2,
      s"rollup + distinct rewrite stack exactly two Expands, got ${expands.size}")
    assert(expands.map(_.projections.size).sorted == Seq(3, 3),
      "3 grouping-set tuples x (2 distinct groups + plain) — got " +
        expands.map(_.projections.size).mkString(","))
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "the rewrite must not plan any join")
  }

  test("bm25_index_topk: query time probes pruned postings, never the corpus") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = staticPlan("bm25_index_topk")
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "the index query must read the postings table")
    // every file scan in the QUERY plan is the postings layout — the
    // corpus parquet never appears (that is the point of persisting)
    scans.foreach { s =>
      val loc = s.metadata("Location")
      assert(loc.contains("postings"), s"non-postings scan in the plan: $loc")
      assert(!loc.contains("documents.parquet"), "the query must never rescan the corpus")
    }
    // the query's term set prunes shard DIRECTORIES at planning time...
    assert(scans.exists(_.metadata.get("PartitionFilters").exists(_.contains("__tshard"))),
      s"expected __tshard partition pruning, got " +
        scans.map(_.metadata.get("PartitionFilters")).mkString(","))
    // ...and pushes term IN (...) into parquet row groups within them
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("In(term"))),
      s"expected a pushed term IN filter, got " +
        scans.map(_.metadata.get("PushedFilters")).mkString(","))
  }

  test("the allowlists only name real queries") {
    val known = SparkEntry.queries.keySet
    val stale = (crossAllowed.keySet ++ udfAllowed.keySet ++
      globalWindowAllowed.keySet ++ shuffleBudget.keySet) -- known
    assert(stale.isEmpty, s"allowlist entries without queries: $stale")
  }
}
